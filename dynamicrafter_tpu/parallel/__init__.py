from dynamicrafter_tpu.parallel.sharding import (
    DATA_AXIS,
    SEQ_AXIS,
    constrain,
    create_mesh,
    use_mesh,
)
