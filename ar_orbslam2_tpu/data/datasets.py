"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

Parity with the reference example mains' LoadImages functions
(Examples/Monocular/mono_tum.cc, mono_kitti.cc, mono_euroc.cc,
Examples/RGB-D/rgbd_tum.cc + associate.py — SURVEY.md §2.3): image lists +
timestamps; TUM rgb<->depth association reimplements associate.py's
nearest-timestamp matching.
"""
from __future__ import annotations

import os

import numpy as np


def _imread_gray(path):
    import cv2
    im = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if im is None:
        raise FileNotFoundError(path)
    return im


def load_tum_monocular(seq_dir):
    """rgb.txt -> (timestamps, image paths). Parity: LoadImages in
    mono_tum.cc."""
    ts, paths = [], []
    with open(os.path.join(seq_dir, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, p = line.split()[:2]
            ts.append(float(t))
            paths.append(os.path.join(seq_dir, p))
    return np.asarray(ts), paths


def associate(ts_a, ts_b, max_dt=0.02):
    """Nearest-timestamp association. Parity: Examples/RGB-D/associate.py."""
    ia, ib = [], []
    j = 0
    for i, t in enumerate(ts_a):
        j = int(np.argmin(np.abs(np.asarray(ts_b) - t)))
        if abs(ts_b[j] - t) <= max_dt:
            ia.append(i)
            ib.append(j)
    return ia, ib


def load_tum_rgbd(seq_dir, max_dt=0.02):
    """(timestamps, rgb paths, depth paths) associated."""
    ts_rgb, rgb = load_tum_monocular(seq_dir)
    ts_d, dep = [], []
    with open(os.path.join(seq_dir, "depth.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, p = line.split()[:2]
            ts_d.append(float(t))
            dep.append(os.path.join(seq_dir, p))
    ia, ib = associate(ts_rgb, np.asarray(ts_d), max_dt)
    return (ts_rgb[ia], [rgb[i] for i in ia], [dep[j] for j in ib])


def load_kitti(seq_dir, stereo=False):
    """KITTI odometry sequence dir (image_0 [, image_1], times.txt).
    Parity: LoadImages in mono_kitti.cc / stereo_kitti.cc."""
    with open(os.path.join(seq_dir, "times.txt")) as f:
        ts = np.asarray([float(x) for x in f.read().split()])
    left = [os.path.join(seq_dir, "image_0", f"{i:06d}.png")
            for i in range(len(ts))]
    if not stereo:
        return ts, left
    right = [os.path.join(seq_dir, "image_1", f"{i:06d}.png")
             for i in range(len(ts))]
    return ts, left, right


def load_euroc(seq_dir, cam="cam0"):
    """EuRoC MAV mav0/camN/data + data.csv timestamps.
    Parity: LoadImages in mono_euroc.cc."""
    base = os.path.join(seq_dir, "mav0", cam)
    ts, paths = [], []
    with open(os.path.join(base, "data.csv")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t_ns, name = line.split(",")[:2]
            ts.append(float(t_ns) * 1e-9)
            paths.append(os.path.join(base, "data", name.strip()))
    return np.asarray(ts), paths


def iter_images(paths):
    for p in paths:
        yield _imread_gray(p)
