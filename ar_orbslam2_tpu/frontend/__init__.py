"""Feature frontend: ORB extraction (pyramid FAST + oriented BRIEF)."""
from .orb import OrbConfig, extract_orb  # noqa: F401
