"""LapPE training path: the random sign-flip augmentation needs its own RNG
stream through the jitted step (reference laplace_pos_encoder.py:102-106)."""
import numpy as np
import pytest

import graphgps_tpu.data.datasets  # noqa: F401
import graphgps_tpu.train.loop  # noqa: F401
from graphgps_tpu.config.config import new_cfg
from graphgps_tpu.driver import run_single


def test_lappe_trains_with_signflip(tmp_path):
    cfg = new_cfg()
    cfg.out_dir = str(tmp_path)
    cfg.dataset.synth_num_graphs = 32
    cfg.dataset.synth_max_nodes = 12
    cfg.dataset.node_encoder_name = "TypeDictNode+LapPE"
    cfg.posenc_LapPE.enable = True
    cfg.posenc_LapPE.dim_pe = 4
    cfg.posenc_LapPE.model = "DeepSet"
    cfg.posenc_LapPE.eigen.max_freqs = 4
    cfg.train.batch_size = 8
    cfg.gt.layers = 1
    cfg.gt.dim_hidden = 16
    cfg.gt.n_heads = 2
    cfg.gnn.dim_inner = 16
    cfg.optim.max_epoch = 2
    cfg.train.enable_ckpt = False
    cfg.metric_best = "mae"
    cfg.metric_agg = "argmin"
    hist = run_single(cfg, str(tmp_path / "run"))
    assert np.isfinite(hist["train"][-1]["loss"])
