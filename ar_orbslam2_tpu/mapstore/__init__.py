from .map import MapStore, MapConfig  # noqa: F401
