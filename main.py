#!/usr/bin/env python
"""CLI entry point: python main.py --cfg configs/GPS/zinc-GPS+RWSE.yaml [overrides…]

TPU-native analog of /root/reference/main.py.
"""
from graphgps_tpu.driver import main

if __name__ == "__main__":
    main()
