from . import triangulation  # noqa: F401
from .local_mapping import LocalMapper, LocalMapperConfig  # noqa: F401
