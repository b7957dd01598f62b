"""Device-mesh sharding for pod-scale stream decode."""

from .sharding import (batch_sharding, decode_granules_sharded, make_mesh,
                       place_batch, place_state, replicate_tables)

__all__ = ["make_mesh", "batch_sharding", "place_batch", "place_state",
           "decode_granules_sharded", "replicate_tables"]
