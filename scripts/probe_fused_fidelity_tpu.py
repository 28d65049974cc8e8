#!/usr/bin/env python
"""Run the full-config fused-front-end fidelity gates on the REAL TPU.

tests/test_fused_fidelity.py runs under the suite's CPU pin, where the
fused kernels execute in interpret mode at f32 and the drift collapses to
rounding noise. The real gate — the single bf16 MXU pass of the fused
front end vs the classic path — is only live on the chip. This driver
imports the test module by file path (bypassing tests/conftest.py) and
executes both gate functions on the default (TPU) backend, printing the
measured drift percentiles next to the gates.

Measured v5e (round 3, trained full-config model): p99 center 0.061 m /
yaw 0.0056 rad / score 0.009. Gates sit at 2.5x those.
"""
from __future__ import annotations

import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    sys.stderr.write(f"backend={jax.default_backend()}\n")
    spec = importlib.util.spec_from_file_location(
        "test_fused_fidelity", "/root/repo/tests/test_fused_fidelity.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    failures = []
    for name in sorted(n for n in dir(mod)
                       if n.startswith("test_") and callable(getattr(mod, n))):
        t0 = time.time()
        try:
            getattr(mod, name)()
            sys.stderr.write(f"{name}: PASS [{time.time()-t0:.0f}s]\n")
        except AssertionError as e:  # keep going: one run = all actuals
            failures.append(name)
            sys.stderr.write(f"{name}: FAIL ({e}) [{time.time()-t0:.0f}s]\n")
    print('{"fused_fidelity_tpu": "%s"}'
          % ("pass" if not failures else "fail:" + ",".join(failures)))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
