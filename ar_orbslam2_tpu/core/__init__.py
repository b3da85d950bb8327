from . import lie, camera, robust, geometry  # noqa: F401
