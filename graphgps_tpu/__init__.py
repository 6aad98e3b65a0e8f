"""graphgps_tpu — TPU-native GPS graph-transformer framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
rampasek/GraphGPS (reference blueprint in SURVEY.md).

Public API::

    from graphgps_tpu import new_cfg, load_dataset, build_model, run_single
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-exports so `import graphgps_tpu` stays cheap
    if name == "new_cfg":
        from .config.config import new_cfg
        return new_cfg
    if name == "load_dataset":
        import graphgps_tpu.data.datasets  # noqa: F401 — populate registries
        from .data.datasets.base import load_dataset
        return load_dataset
    if name == "build_model":
        from .models.networks import build_model
        return build_model
    if name == "run_single":
        import graphgps_tpu.data.datasets  # noqa: F401
        import graphgps_tpu.train.loop  # noqa: F401
        from .driver import run_single
        return run_single
    raise AttributeError(name)
