from . import hamming  # noqa: F401
