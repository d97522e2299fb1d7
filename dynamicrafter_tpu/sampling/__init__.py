from dynamicrafter_tpu.sampling.ancestral import p_sample_loop
from dynamicrafter_tpu.sampling.ddim import (
    CFGConditioning,
    SamplerSettings,
    ddim_decode,
    ddim_sample,
    make_cfg_denoiser,
    stochastic_encode,
)
