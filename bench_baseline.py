#!/usr/bin/env python
"""Measure the PyTorch reference-equivalent full cascade (4-view heatmap ->
MVFex -> pose3d, fp32 eager -- tests/torch_ref.py, an independent
transcription of the reference network with identical state-dict layout and
verified numeric parity) on this host, and record the result for bench.py's
``vs_baseline`` ratio.

The reference targets a single datacenter GPU; none is attached here, so the
measurable torch baseline is CPU eager (recorded as such). Run once:

    python bench_baseline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def main():
    import torch

    from torch_ref import EgoRearTorch

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "calib", "ego4view_rig.json")) as f:
        calibs = json.load(f)["cameras"]

    torch.manual_seed(0)
    model = EgoRearTorch(calibs, feat=64).eval()
    img = torch.randn(1, 4, 3, 256, 256)

    with torch.no_grad():
        model(img)  # warmup
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            model(img)
        dt = time.perf_counter() - t0
    fps = n / dt
    out = {
        "fps": round(fps, 3),
        "source": f"torch {torch.__version__} eager fp32 CPU "
                  f"({os.cpu_count()} cores), batch 1, 4-view full cascade",
        "note": "reference-equivalent network (tests/torch_ref.py); no GPU "
                "attached on this host -- see BASELINE.md",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_BASELINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
