from .frame import Frame  # noqa: F401
from .tracking import Tracking, TrackingConfig  # noqa: F401
