"""A/B the host-premirrored flip input contract vs the in-graph mirror.

Round-3 flip trace (PERF.md): the one flip-SPECIFIC removable op is the
input mirror permutation (reverse.10, 0.316 ms on the 25 MB packed input —
XLA does not fuse it into the u8 affine). flip_test="premirrored" moves the
mirror into the host input contract (the native loader composes the flip
into the warp for free; bench prepare() mirrors in numpy), so the device
graph starts at the u8 affine. Bit-exact
(tests/test_serving.py::test_serving_premirrored_flip_matches_device_mirror).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/ab_flip_premirror.py [batch]
"""

from __future__ import annotations

import sys

import bench


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bench._enable_compile_cache()
    rtt = bench._tunnel_rtt()
    print(f"tunnel rtt {rtt*1e3:.1f} ms", flush=True)
    results = {}
    for mode in (True, "premirrored", True, "premirrored"):
        pipe, params, x = bench._built_on_cpu(
            bench._build_serving, batch, flip_test=mode)
        fps = bench._measure(pipe, params, x, batch, rtt)
        results.setdefault(str(mode), []).append(fps)
        print(f"flip={mode!s:12s}: {fps:.1f} 4-view frames/s", flush=True)
    for k, v in results.items():
        print(f"{k}: best {max(v):.1f}")


if __name__ == "__main__":
    main()
