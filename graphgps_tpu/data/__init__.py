from .graph import Graph, GraphBatch
from .batching import BatchLoader, HostBatch, collate
