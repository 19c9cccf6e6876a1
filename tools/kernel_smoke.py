"""Real-TPU lowering smoke test for the serving Pallas kernels.

interpret=True (all CPU tests) does not validate Mosaic lowering rules;
this runs each kernel once on the real device at serving-like shapes and
checks results against the interpret path (see
avsr_tpu/ops/pallas/selfcheck.py — bench.py runs the same checks before
trusting the full serving config). Run after touching any kernel
(see .claude/skills/verify: Pallas/Mosaic trap).

Usage: python tools/kernel_smoke.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from avsr_tpu.core.cache import enable_compilation_cache
    from avsr_tpu.ops.pallas.selfcheck import (
        check_serving_kernels,
        check_train_kernels,
    )

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    check_serving_kernels()
    print("serving kernels OK", flush=True)
    check_train_kernels()
    print("ALL KERNELS OK", flush=True)


if __name__ == "__main__":
    main()
