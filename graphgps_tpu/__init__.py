"""graphgps_tpu — TPU-native GPS graph-transformer framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
rampasek/GraphGPS (reference blueprint in SURVEY.md)."""

__version__ = "0.1.0"
