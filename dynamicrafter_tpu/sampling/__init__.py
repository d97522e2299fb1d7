from dynamicrafter_tpu.sampling.ddim import (
    CFGConditioning,
    SamplerSettings,
    ddim_decode,
    ddim_sample,
    make_cfg_denoiser,
    stochastic_encode,
)
