"""Component registries.

TPU-native capability equivalent of GraphGym's registry pattern used throughout the
reference (e.g. /root/reference/graphgps/network/gps_model.py:2,24,40,102). Plain
dicts keyed by name; decorators register classes/functions.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

# One dict per component kind (mirrors GraphGym's register.* dicts).
node_encoder_dict: Dict[str, Any] = {}
edge_encoder_dict: Dict[str, Any] = {}
layer_dict: Dict[str, Any] = {}
network_dict: Dict[str, Any] = {}
head_dict: Dict[str, Any] = {}
pooling_dict: Dict[str, Any] = {}
loss_dict: Dict[str, Any] = {}
optimizer_dict: Dict[str, Any] = {}
scheduler_dict: Dict[str, Any] = {}
train_dict: Dict[str, Any] = {}
loader_dict: Dict[str, Any] = {}
config_dict: Dict[str, Any] = {}
metric_dict: Dict[str, Any] = {}
act_dict: Dict[str, Any] = {}
dataset_dict: Dict[str, Any] = {}


def _register(d: Dict[str, Any], name: str) -> Callable[[Any], Any]:
    def deco(obj: Any) -> Any:
        if name in d and d[name] is not obj:
            raise KeyError(f"duplicate registration: {name!r}")
        d[name] = obj
        return obj

    return deco


def register_node_encoder(name):
    return _register(node_encoder_dict, name)


def register_edge_encoder(name):
    return _register(edge_encoder_dict, name)


def register_layer(name):
    return _register(layer_dict, name)


def register_network(name):
    return _register(network_dict, name)


def register_head(name):
    return _register(head_dict, name)


def register_pooling(name):
    return _register(pooling_dict, name)


def register_loss(name):
    return _register(loss_dict, name)


def register_optimizer(name):
    return _register(optimizer_dict, name)


def register_scheduler(name):
    return _register(scheduler_dict, name)


def register_train(name):
    return _register(train_dict, name)


def register_loader(name):
    return _register(loader_dict, name)


def register_config(name):
    return _register(config_dict, name)


def register_metric(name):
    return _register(metric_dict, name)


def register_act(name):
    return _register(act_dict, name)


def register_dataset(name):
    return _register(dataset_dict, name)
