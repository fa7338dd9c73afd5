from cosyvoice_tpu.parallel.sharding import (
    make_mesh,
    lm_param_spec,
    shard_params,
    batch_spec,
    named_sharding,
)
