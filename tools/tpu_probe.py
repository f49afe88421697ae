"""TPU health probe: init the backend, run one op, print timing.

Exit 0 = device usable; exit 1 = backend init or execution failed.
Useful before launching long runs (and inside outage loops — see
tools/run_with_watchdog.py for the recovery story).
"""

import sys
import time


def main():
    t0 = time.time()
    try:
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        t1 = time.time()
        x = jnp.arange(8.0)
        y = float(jax.jit(lambda v: (v * 2).sum())(x))
        t2 = time.time()
        assert y == 56.0, y
        print(
            f"TPU OK: {len(devs)}x {devs[0].platform}:{devs[0].device_kind} "
            f"(init {t1 - t0:.1f}s, op {t2 - t1:.1f}s)"
        )
        return 0
    except Exception as e:
        print(f"TPU UNAVAILABLE after {time.time() - t0:.1f}s: "
              f"{type(e).__name__}: {str(e)[:300]}")
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
