"""Tiny full-pipeline model config (CPU-friendly) for smoke tests and
multi-chip dry runs."""

TINY_MODEL_CONFIG = {
    "model": {
        "target": "dynamicrafter_tpu.pipeline.LatentVisualDiffusion",
        "params": {
            "linear_start": 0.00085,
            "linear_end": 0.012,
            "timesteps": 1000,
            "parameterization": "v",
            "rescale_betas_zero_snr": True,
            "use_dynamic_rescale": True,
            "base_scale": 0.7,
            "conditioning_key": "hybrid",
            "scale_factor": 0.18215,
            "uncond_type": "empty_seq",
            "perframe_ae": False,
            "unet_config": {
                "target": "dynamicrafter_tpu.models.unet3d.UNetModel",
                "params": {
                    "in_channels": 8,
                    "out_channels": 4,
                    "model_channels": 32,
                    "attention_resolutions": [2, 1],
                    "num_res_blocks": 1,
                    "channel_mult": [1, 2],
                    "num_head_channels": 16,
                    "transformer_depth": 1,
                    "context_dim": 48,
                    "temporal_conv": True,
                    "temporal_attention": True,
                    "temporal_length": 4,
                    "addition_attention": True,
                    "image_cross_attention": True,
                    "image_cross_attention_scale_learnable": True,
                    "default_fs": 3,
                    "fs_condition": True,
                    "dropout": 0.0,
                },
            },
            "first_stage_config": {
                "target": "dynamicrafter_tpu.models.vae.AutoencoderKL",
                "params": {
                    "embed_dim": 4,
                    "ddconfig": {
                        "double_z": True,
                        "z_channels": 4,
                        "resolution": 16,
                        "in_channels": 3,
                        "out_ch": 3,
                        "ch": 32,
                        "ch_mult": [1, 2],
                        "num_res_blocks": 1,
                        "attn_resolutions": [],
                        "dropout": 0.0,
                    },
                },
            },
            "cond_stage_config": {
                "target": "dynamicrafter_tpu.models.clip.FrozenOpenCLIPEmbedder",
                "params": {"freeze": True, "layer": "penultimate"},
            },
            "img_cond_stage_config": {
                "target": "dynamicrafter_tpu.models.clip.FrozenOpenCLIPImageEmbedderV2",
                "params": {"freeze": True},
            },
            "image_proj_stage_config": {
                "target": "dynamicrafter_tpu.models.resampler.Resampler",
                "params": {
                    "dim": 32,
                    "depth": 1,
                    "dim_head": 8,
                    "heads": 4,
                    "num_queries": 4,
                    "embedding_dim": 40,
                    "output_dim": 48,
                    "ff_mult": 2,
                    "video_length": 4,
                },
            },
            # test-only size overrides for the CLIP towers
            "clip_text_config": {
                "params": {
                    "vocab_size": 49408, "width": 48, "heads": 4,
                    "layers": 2, "context_length": 77, "penultimate": True,
                },
            },
            "clip_vision_config": {
                "params": {
                    "width": 40, "heads": 4, "layers": 2,
                    "patch_size": 8, "image_size": 32,
                },
            },
        },
    }
}
