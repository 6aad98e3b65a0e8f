#!/usr/bin/env python
"""CLI entry point: python main.py --cfg configs/GPS/zinc-GPS+RWSE.yaml [overrides…]

TPU-native analog of /root/reference/main.py.
"""
import os

# Honor JAX_PLATFORMS=cpu even where a site plugin overrides the env var
# (must run before any backend initialization).
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from graphgps_tpu.driver import main

if __name__ == "__main__":
    main()
