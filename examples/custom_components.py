"""Extension template: registering custom components (the capability of the
reference's example templates, graphgps/layer/example.py + config/example.py).

Run: python examples/custom_components.py
"""
import jax.numpy as jnp
from flax import linen as nn

from graphgps_tpu.registry import (register_config, register_head,
                                   register_loss, register_node_encoder)


# 1. a config extender — adds keys before the tree is built. Use CfgNode so
# attribute access and YAML unknown-key validation work for the new group.
@register_config("my_example")
def my_example_cfg(cfg):
    from graphgps_tpu.config.config import CfgNode

    node = CfgNode()
    node.strength = 0.5
    cfg.my_example = node


# 2. a node encoder
@register_node_encoder("MyNode")
class MyNodeEncoder(nn.Module):
    dim_emb: int

    @nn.compact
    def __call__(self, batch, x, train):
        return nn.Dense(self.dim_emb)(batch.node_feat.astype(jnp.float32))


# 3. a loss
@register_loss("my_l3")
def my_l3(pred, true, mask):
    d = jnp.abs(pred - jnp.nan_to_num(true)) ** 3
    m = mask.reshape(mask.shape + (1,) * (d.ndim - mask.ndim)).astype(d.dtype)
    return (d * m).sum() / jnp.maximum(m.sum(), 1.0)


if __name__ == "__main__":
    from graphgps_tpu import new_cfg

    cfg = new_cfg()
    print("custom config group:", cfg.my_example)
    print("registered: MyNode encoder, my_l3 loss")
