"""Parity tests for the alternate conditioning encoders.

Oracles: HF transformers models instantiated OFFLINE from tiny configs with
random weights (CLIPTextModel for FrozenCLIPEmbedder, T5EncoderModel for
FrozenT5Embedder — the exact modules the reference wraps,
lvdm/modules/encoders/condition.py:175-252), plus a torch open_clip-layout
vision tower for the pooled image embedders.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynamicrafter_tpu.models.clip import CLIPVisionConfig  # noqa: E402
from dynamicrafter_tpu.models.encoders import (  # noqa: E402
    ClassEmbedder, CLIPT5Encoder, CLIPVisionPooled, HFCLIPTextConfig,
    HFCLIPTextEncoder, T5Config, T5Encoder, identity_encode,
)
from dynamicrafter_tpu.utils import weights as W  # noqa: E402

from test_conditioning_parity import _OracleVisionTower, randomize_  # noqa: E402


def _tiny_hf_clip(layers=3, width=32, heads=4, ctx=16, vocab=100, seed=0):
    cfg = transformers.CLIPTextConfig(
        vocab_size=vocab, hidden_size=width, intermediate_size=width * 4,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=ctx, hidden_act="quick_gelu",
        eos_token_id=vocab - 1)
    torch.manual_seed(seed)
    model = transformers.CLIPTextModel(cfg).eval()
    ours = HFCLIPTextConfig(vocab_size=vocab, width=width, heads=heads,
                            layers=layers, context_length=ctx,
                            eos_token_id=vocab - 1)
    return model, ours


def _tokens_with_eos(rng, vocab, b, ctx):
    """Random ids with an EOS somewhere (like real tokenizer output)."""
    toks = rng.integers(0, vocab - 1, (b, ctx))
    eos_pos = rng.integers(2, ctx, (b,))
    for i, p in enumerate(eos_pos):
        toks[i, p:] = vocab - 1
    return toks.astype(np.int64)


@pytest.mark.parametrize("layer,layer_idx", [
    ("last", None), ("pooled", None), ("hidden", -2), ("hidden", 1),
])
@pytest.mark.slow
def test_hf_clip_text_parity(layer, layer_idx):
    model, base = _tiny_hf_clip()
    cfg = HFCLIPTextConfig(**{**base.__dict__,
                              "layer": layer, "layer_idx": layer_idx})
    toks = _tokens_with_eos(np.random.default_rng(0), cfg.vocab_size, 2,
                            cfg.context_length)
    with torch.no_grad():
        out = model(input_ids=torch.tensor(toks),
                    output_hidden_states=layer == "hidden")
        if layer == "last":
            ref = out.last_hidden_state.numpy()
        elif layer == "pooled":
            ref = out.pooler_output[:, None, :].numpy()
        else:
            ref = out.hidden_states[layer_idx].numpy()

    params = W.convert_hf_clip_text(
        {k: v.numpy() for k, v in model.state_dict().items()})
    got = np.asarray(jax.jit(HFCLIPTextEncoder(cfg).apply)(
        {"params": params}, jnp.asarray(toks.astype(np.int32))))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=0)


def test_t5_encoder_parity():
    tcfg = transformers.T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
        dropout_rate=0.0)
    torch.manual_seed(1)
    model = transformers.T5EncoderModel(tcfg).eval()
    # exercise asymmetric magnitudes (RMSNorm + unscaled attention paths)
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(3.0)
    cfg = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=3,
                   num_heads=4, rel_buckets=8, rel_max_distance=20)
    toks = np.random.default_rng(1).integers(0, 100, (2, 16)).astype(np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(toks)).last_hidden_state.numpy()

    params = W.convert_t5_encoder(
        {k: v.numpy() for k, v in model.state_dict().items()})
    got = np.asarray(jax.jit(T5Encoder(cfg).apply)(
        {"params": params}, jnp.asarray(toks.astype(np.int32))))
    assert got.shape == ref.shape
    # the 3x stress scaling amplifies fp32 accumulation-order noise; bound
    # relative error instead of absolute
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=2e-3)


class _OraclePooledVision(_OracleVisionTower):
    """open_clip visual layout incl. ln_post + proj (pooled image encode,
    condition.py:286-291 via clip encode_image)."""

    def __init__(self, width, heads, layers, patch, image, out_dim):
        super().__init__(width, heads, layers, patch, image)
        self.ln_post = torch.nn.LayerNorm(width)
        self.proj = torch.nn.Parameter(torch.empty(width, out_dim))

    def forward(self, x):
        tokens = super().forward(x)
        return self.ln_post(tokens[:, 0]) @ self.proj


def test_clip_vision_pooled_parity():
    cfg = CLIPVisionConfig(width=32, heads=4, layers=2, patch_size=8,
                           image_size=32)
    oracle = randomize_(
        _OraclePooledVision(32, 4, 2, 8, 32, out_dim=24).eval(),
        seed=2, std=0.1)
    x = np.random.default_rng(2).standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.tensor(x)).numpy()

    sd = {"model.visual." + k: v.numpy() for k, v in oracle.state_dict().items()}
    params = W.convert_clip_vision_pooled(sd)
    got = np.asarray(jax.jit(CLIPVisionPooled(cfg, output_dim=24).apply)(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert got.shape == (2, 24)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=0)


def test_clip_vision_pooled_ucg_zeroing():
    cfg = CLIPVisionConfig(width=16, heads=2, layers=1, patch_size=8,
                           image_size=16)
    mod = CLIPVisionPooled(cfg, output_dim=8)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((64, 16, 16, 3)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x, rng=jax.random.PRNGKey(1), ucg_rate=0.5)
    zeroed = np.asarray(jnp.all(out == 0, axis=-1))
    # per-sample all-or-nothing zeroing, roughly half
    assert 10 < zeroed.sum() < 54
    nonzero = np.asarray(out)[~zeroed]
    base = np.asarray(mod.apply(params, x))[~zeroed]
    np.testing.assert_allclose(nonzero, base, atol=1e-6)


def test_class_embedder():
    emb = ClassEmbedder(embed_dim=8, n_classes=10, ucg_rate=0.5)
    ids = jnp.arange(6, dtype=jnp.int32)
    params = emb.init(jax.random.PRNGKey(0), ids, disable_dropout=True)
    table = np.asarray(params["params"]["embedding"]["embedding"])

    out = np.asarray(emb.apply(params, ids, disable_dropout=True))
    assert out.shape == (6, 1, 8)
    np.testing.assert_allclose(out[:, 0], table[:6], atol=0)

    # ucg dropout: every row is either its own class or the uncond class
    drop = np.asarray(emb.apply(params, ids, rng=jax.random.PRNGKey(3)))
    own = np.all(drop[:, 0] == table[:6], axis=-1)
    unc = np.all(drop[:, 0] == table[9], axis=-1)
    assert np.all(own | unc)

    uc = np.asarray(emb.unconditional_ids(4))
    np.testing.assert_array_equal(uc, [9, 9, 9, 9])


def test_clip_t5_joint_and_identity():
    ccfg = HFCLIPTextConfig(vocab_size=50, width=16, heads=2, layers=2,
                            context_length=8, eos_token_id=49)
    tcfg = T5Config(vocab_size=60, d_model=16, d_kv=8, d_ff=32, num_layers=2,
                    num_heads=2, rel_buckets=4, rel_max_distance=10)
    mod = CLIPT5Encoder(ccfg, tcfg)
    ct = jnp.zeros((2, 8), dtype=jnp.int32)
    tt = jnp.zeros((2, 8), dtype=jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), ct, tt)
    clip_z, t5_z = jax.jit(mod.apply)(params, ct, tt)
    assert clip_z.shape == (2, 8, 16) and t5_z.shape == (2, 8, 16)

    x = jnp.ones((3, 4))
    assert identity_encode(x) is x


# ---------------------------------------------------------------------------
# config-target wiring: a YAML naming an alternate encoder gets the native
# tower through the pipeline (config.py role mapping)
# ---------------------------------------------------------------------------

import copy

from dynamicrafter_tpu.config import ModelConfig
from dynamicrafter_tpu.models.encoders import HFCLIPTextEncoder as _HFEnc
from dynamicrafter_tpu.pipeline import DynamiCrafterPipeline
from tiny_config import TINY_MODEL_CONFIG


def _tiny_with_cond_stage(target, params=None, clip_text=None):
    node = copy.deepcopy(TINY_MODEL_CONFIG)
    p = node["model"]["params"]
    p["cond_stage_config"] = {"target": target, "params": params or {}}
    if clip_text is not None:
        p["clip_text_config"] = {"params": clip_text}
    return ModelConfig(node)


@pytest.mark.slow
def test_pipeline_builds_hf_clip_text_from_config():
    cfg = _tiny_with_cond_stage(
        "lvdm.modules.encoders.condition.FrozenCLIPEmbedder",
        params={"layer": "pooled"},
        clip_text={"vocab_size": 49408, "width": 48, "heads": 4,
                   "layers": 2, "context_length": 77})
    assert cfg.cond_stage_role == "clip_text_hf"
    pipe = DynamiCrafterPipeline(cfg)
    assert isinstance(pipe.text_encoder, _HFEnc)
    assert pipe.text_encoder.config.layer == "pooled"
    pipe.init_random(latent_hw=(4, 4))
    z = pipe.embed_text(["a cat"])
    assert z.shape == (1, 1, 48)  # pooled -> single token


def test_openclip_layer_last_honored():
    cfg = _tiny_with_cond_stage(
        "lvdm.modules.encoders.condition.FrozenOpenCLIPEmbedder",
        params={"layer": "last"},
        clip_text={"vocab_size": 49408, "width": 48, "heads": 4,
                   "layers": 2, "context_length": 77})
    pipe = DynamiCrafterPipeline(cfg)
    assert pipe.text_encoder.config.penultimate is False


def test_pooled_image_target_rejected_with_pointer():
    node = copy.deepcopy(TINY_MODEL_CONFIG)
    node["model"]["params"]["img_cond_stage_config"] = {
        "target": "lvdm.modules.encoders.condition.FrozenOpenCLIPImageEmbedder",
        "params": {},
    }
    cfg = ModelConfig(node)
    with pytest.raises(ValueError, match="CLIPVisionPooled"):
        DynamiCrafterPipeline(cfg)


def test_hf_role_pads_with_eot():
    # HF CLIPTokenizer pads with EOT; pad positions are visible on the
    # unmasked layer="last" output, so the hf role must request pad_id=eos
    cfg = _tiny_with_cond_stage(
        "lvdm.modules.encoders.condition.FrozenCLIPEmbedder",
        clip_text={"vocab_size": 49408, "width": 48, "heads": 4,
                   "layers": 2, "context_length": 77})
    pipe = DynamiCrafterPipeline(cfg)
    toks = pipe.tokenizer(["hi"])
    eos = pipe.text_encoder.config.eos_token_id
    assert toks[0, -1] == eos and toks[0, -10] == eos  # padded with EOT
    # default open_clip role keeps zero padding
    pipe0 = DynamiCrafterPipeline(ModelConfig(
        __import__("copy").deepcopy(TINY_MODEL_CONFIG)))
    assert pipe0.tokenizer(["hi"])[0, -1] == 0


def test_unknown_cond_stage_target_rejected():
    with pytest.raises(ValueError, match="unrecognized conditioning target"):
        _tiny_with_cond_stage("my.custom.MysteryEncoder")
