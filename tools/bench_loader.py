"""Host input-pipeline throughput vs the device train step.

The TPU step at the reference config now takes ~33.6 ms (FRVSR) / ~165 ms
(TecoGAN) — the host loader must sustain >= 30 batches/sec or the MXU
starves (SURVEY.md §7 "host input pipeline throughput"). Measures
batches/sec of BatchLoader over synthetic PNG scenes for both executors.

Usage: python tools/bench_loader.py [n_scenes] [n_batches]
"""

from __future__ import annotations

import sys
import tempfile
import time
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
from tecogan_tpu.config import TecoConfig
from tecogan_tpu.data.loader import BatchLoader, SceneDataset
from tecogan_tpu.data.synthetic import write_synthetic_scenes


def main() -> None:
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    with tempfile.TemporaryDirectory() as td:
        write_synthetic_scenes(td, num_scenes=n_scenes, num_frames=30,
                               height=160, width=160, start_index=1000)
        cfg = TecoConfig(batch_size=4, crop_size=32, rnn_n=10,
                         str_dir=1000, end_dir=1000 + n_scenes - 1,
                         end_dir_val=1000 + n_scenes - 1,
                         input_video_dir=td, queue_thread=6, max_frm=29)
        for executor in ("python", "native"):
            for cache_mb in (0, 256):
                c = cfg.replace(loader_cache_mb=cache_mb)
                try:
                    loader = BatchLoader(SceneDataset(c), executor=executor)
                except Exception as e:  # native lib may be unbuilt
                    print(f"{executor}: unavailable ({e})")
                    break
                with loader:
                    # Warm the pool AND the frame cache (steady-state number;
                    # one pass covers the window set at these scene sizes).
                    for _ in range(n_batches // 2):
                        loader.next_batch()
                    t0 = time.perf_counter()
                    for _ in range(n_batches):
                        loader.next_batch()
                    dt = time.perf_counter() - t0
                print(f"{executor:6s} cache={cache_mb:3d}MB: "
                      f"{n_batches / dt:6.1f} batches/sec "
                      f"({dt / n_batches * 1e3:.1f} ms/batch)")


if __name__ == "__main__":
    main()
