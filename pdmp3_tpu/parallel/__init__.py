"""Device-mesh sharding for pod-scale stream decode."""

from .sharding import (batch_sharding, decode_granules_sharded, make_mesh,
                       place_batch, place_pallas_state, place_state,
                       replicate_tables, sharded_frame_soa_step)

__all__ = ["make_mesh", "batch_sharding", "place_batch", "place_state",
           "place_pallas_state", "decode_granules_sharded",
           "sharded_frame_soa_step", "replicate_tables"]
