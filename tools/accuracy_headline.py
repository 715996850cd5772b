#!/usr/bin/env python
"""Headline-scale accuracy artifact: 256^3 x 1000 steps, fp32 vs compiled C.

The north star (SURVEY section 6) is fp32 relative L2 < 1e-5 vs the C
reference (main.c, fp64) over 1000 leapfrog steps at the report's benchmark
scale.  tests/test_golden_c.py pins this at CI scale (20^3 and 64^3); this
tool reproduces it at the full 256^3 x 1k headline scale and prints one
JSON line per component, recorded in STATUS.md.

Usage:
    python tools/accuracy_headline.py [N] [steps]   # default 256 1000

Builds /root/reference/main.c with the stubbed Silo from tests/golden/
(only write_silo, main.c:550-598, touches Silo), runs it in validation
mode (~4 min single-core at 256^3), runs the framework fp32 on the default
backend, and compares the final cell-centered snapshot.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import struct
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference/main.c"
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")


def read_dump(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        (nd,) = struct.unpack("<i", f.read(4))
        dims = struct.unpack(f"<{nd}i", f.read(4 * nd))
        data = np.fromfile(f, dtype="<f8")
    return data.reshape(dims[::-1])


def run_c(text: str) -> str:
    """Run the stub-compiled C reference for scene ``text``; cached on disk."""
    with open(REF, "rb") as f:
        key = hashlib.sha256(f.read() + text.encode()).hexdigest()[:16]
    cache = os.path.join("/tmp", f"fdtd_golden_cache_{key}")
    if os.path.isdir(os.path.join(cache, "r")) and glob.glob(
        os.path.join(cache, "r", "result*.bin")
    ):
        return os.path.join(cache, "r")
    os.makedirs(os.path.join(cache, "r"), exist_ok=True)
    binary = os.path.join(cache, "microwave_golden")
    subprocess.run(
        [os.environ.get("CC", "gcc"), "-O2", "-std=c99", REF,
         os.path.join(GOLDEN_DIR, "silo_stub.c"), "-I", GOLDEN_DIR,
         "-lm", "-o", binary],
        check=True, capture_output=True,
    )
    with open(os.path.join(cache, "params.txt"), "w") as f:
        f.write(text)
    t0 = time.time()
    subprocess.run([binary, "params.txt"], cwd=cache, check=True,
                   capture_output=True, timeout=3600)
    print(f"# C reference run: {time.time() - t0:.1f}s", file=sys.stderr)
    return os.path.join(cache, "r")


def main(n: int = 256, steps: int = 1000) -> None:
    dx = 0.001
    text = f"{n * dx} {n * dx} {n * dx} {dx} 0.000000000001 {steps * 1e-12} {steps} 0"
    dump_dir = run_c(text)

    from fdtd_tpu.io.vtr import read_vtr_cell_arrays
    from fdtd_tpu.params import parse_params_text
    from fdtd_tpu.runner import run_simulation

    p = parse_params_text(text, dtype="float32")
    assert p.maxi == n, p.maxi
    out = os.path.join("/tmp", f"fdtd_headline_{n}_{steps}")
    t0 = time.time()
    run_simulation(p, out_dir=out, log=lambda s: None)
    print(f"# framework fp32 run: {time.time() - t0:.1f}s", file=sys.stderr)

    last = max(
        int(os.path.basename(f)[len("result"): len("result") + 4])
        for f in glob.glob(os.path.join(dump_dir, "result*.silo.ex.bin"))
    )
    assert last == steps, last
    ours = read_vtr_cell_arrays(os.path.join(out, f"result{last:04d}.vtr"))
    worst = 0.0
    for v in ["ey", "hx", "hz"]:  # the TE101 mode's nonzero components
        c = read_dump(os.path.join(dump_dir, f"result{last:04d}.silo.{v}.bin"))
        o = np.asarray(ours[v], dtype=np.float64)
        l2 = float(np.sqrt(np.sum((o - c) ** 2) / np.sum(c * c)))
        worst = max(worst, l2)
        print(json.dumps({"component": v, "rel_l2_vs_c": l2, "n": n,
                          "steps": steps, "dtype": "float32"}))
    for v in ["ex", "ez", "hy"]:  # identically zero in this mode
        assert float(np.abs(np.asarray(ours[v])).max()) == 0.0, v
    status = "PASS" if worst < 1e-5 else "FAIL"
    print(f"# north star (<1e-5): {status} (worst {worst:.3e})", file=sys.stderr)
    sys.exit(0 if worst < 1e-5 else 1)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
