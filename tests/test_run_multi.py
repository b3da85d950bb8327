"""Multi-sequence data-parallel runner (SURVEY §2.5 DP row).

Two independent synthetic sequences interleaved chunk-by-chunk through
two SlamSystems — each keeps its own map and device-resident tracking
state, and neither corrupts the other (the single-host analog of the
per-sequence-per-host "KITTI 00+05" distributed config).
"""
import sys
import types

import numpy as np

from ar_orbslam2_tpu.apps import run_multi
from ar_orbslam2_tpu.utils.config import Settings


def test_two_sequences_interleaved(tmp_path):
    st = Settings()
    args = types.SimpleNamespace(synthetic=2, frames=40, chunk=8,
                                 seqs="", out_prefix=None)
    sources = run_multi.load_sources(args, st)
    assert len(sources) == 2
    from ar_orbslam2_tpu.apps.common import build_system
    systems = [build_system(st, sensor="MONOCULAR") for _ in sources]
    cursors = [0, 0]
    done = False
    while not done:
        done = True
        for k, (src, slam) in enumerate(zip(sources, systems)):
            i = cursors[k]
            if i >= len(src["frames"]):
                continue
            done = False
            j = min(i + args.chunk, len(src["frames"]))
            slam.track_monocular_batch(src["frames"][i:j],
                                       timestamps=src["ts"][i:j],
                                       chunk=args.chunk)
            cursors[k] = j
    for src, slam in zip(sources, systems):
        slam.shutdown()
        ok = sum(1 for m in slam.tracking.metrics if m.get("ok"))
        assert ok > 0.6 * len(src["frames"]), \
            f"{src['name']}: {ok}/{len(src['frames'])}"
        assert slam.store.n_keyframes() >= 2
    # independent maps: different scenes -> different landmark counts,
    # and neither store aliases the other
    assert systems[0].store is not systems[1].store
