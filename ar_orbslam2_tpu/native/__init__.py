"""Native (C++) runtime components, loaded via ctypes.

The reference implements its map bookkeeping in C++ (src/MapPoint.cc,
src/KeyFrame.cc); here the TPU owns the numeric hot paths and this package
owns the host-side pointer-graph bookkeeping. Every native kernel has a
vectorized numpy fallback in mapstore/map.py that doubles as its oracle.
"""
from . import mapgraph  # noqa: F401
