"""VAE parity vs reference ae_modules (torch CPU oracle) + tiled decode."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import requires_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynamicrafter_tpu.models.vae import (  # noqa: E402
    AutoencoderKL, Decoder, DiagonalGaussian, Encoder, VAEConfig, decode_tiled,
)
from dynamicrafter_tpu.utils import weights as W  # noqa: E402

TINY = VAEConfig(
    double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
    dropout=0.0, embed_dim=4,
)


def randomize_(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g, dtype=torch.float32) * 0.05
    module.load_state_dict(sd)
    return module


def torch_kwargs(cfg: VAEConfig):
    return dict(
        double_z=cfg.double_z, z_channels=cfg.z_channels, resolution=cfg.resolution,
        in_channels=cfg.in_channels, out_ch=cfg.out_ch, ch=cfg.ch,
        ch_mult=list(cfg.ch_mult), num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=list(cfg.attn_resolutions), dropout=0.0,
    )


@requires_reference
def test_encoder_parity():
    from lvdm.modules.networks.ae_modules import Encoder as RefEncoder

    ref = randomize_(RefEncoder(**torch_kwargs(TINY)).eval())
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x)).numpy()

    params = {"encoder": W.convert_vae(
        {"encoder." + k: v.numpy() for k, v in ref.state_dict().items()}
    )["encoder"]}
    out = jax.jit(Encoder(TINY).apply)(
        {"params": params["encoder"]}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, out_ref, atol=1e-3, rtol=0)


@requires_reference
def test_decoder_parity():
    from lvdm.modules.networks.ae_modules import Decoder as RefDecoder

    ref = randomize_(RefDecoder(**torch_kwargs(TINY)).eval())
    z = np.random.default_rng(1).standard_normal((2, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(z)).numpy()

    params = W.convert_vae(
        {"decoder." + k: v.numpy() for k, v in ref.state_dict().items()})["decoder"]
    out = jax.jit(Decoder(TINY).apply)(
        {"params": params}, jnp.asarray(np.transpose(z, (0, 2, 3, 1))))
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, out_ref, atol=1e-3, rtol=0)


@requires_reference
def test_autoencoder_roundtrip_parity():
    """Full encode->sample->decode against a torch assembly of the same parts."""
    from lvdm.modules.networks.ae_modules import (
        Decoder as RefDecoder, Encoder as RefEncoder,
    )

    g = torch.Generator().manual_seed(7)
    enc = randomize_(RefEncoder(**torch_kwargs(TINY)).eval(), 1)
    dec = randomize_(RefDecoder(**torch_kwargs(TINY)).eval(), 2)
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    for m in (quant, post):
        torch.nn.init.normal_(m.weight, std=0.2, generator=g)
        torch.nn.init.normal_(m.bias, std=0.2, generator=g)

    x = np.random.default_rng(3).standard_normal((1, 3, 32, 32)).astype(np.float32)
    noise = np.random.default_rng(4).standard_normal((1, 4, 16, 16)).astype(np.float32)

    with torch.no_grad():
        moments = quant(enc(torch.tensor(x)))
        mean, logvar = torch.chunk(moments, 2, dim=1)
        z = mean + torch.exp(0.5 * torch.clamp(logvar, -30, 20)) * torch.tensor(noise)
        out_ref = dec(post(z)).numpy()

    sd = {}
    sd.update({"encoder." + k: v.numpy() for k, v in enc.state_dict().items()})
    sd.update({"decoder." + k: v.numpy() for k, v in dec.state_dict().items()})
    sd.update({"quant_conv." + k: v.numpy() for k, v in quant.state_dict().items()})
    sd.update({"post_quant_conv." + k: v.numpy() for k, v in post.state_dict().items()})
    params = W.convert_vae(sd)

    model = AutoencoderKL(TINY)

    def run(p, xj, nj):
        def f(mod):
            moments = mod.encode_moments(xj)
            zj = DiagonalGaussian(moments).sample(nj)
            return mod.decode(zj)
        return model.apply({"params": p}, method=f)

    out = jax.jit(run)(
        params,
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(noise, (0, 2, 3, 1))),
    )
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, out_ref, atol=1e-3, rtol=0)


def test_decode_tiled_exact_for_local_decoder():
    """Tiling machinery (slicing, overlap blending, weight normalization) must
    be exact for a tile-local decode function."""
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((2, 24, 40, 4)).astype(np.float32))

    def decode_fn(zt):  # pointwise nonlinearity + 2x nearest upsample, 3 ch
        up = jnp.repeat(jnp.repeat(jnp.tanh(zt[..., :3]) * 1.7, 2, axis=1), 2, axis=2)
        return up

    full = np.asarray(decode_fn(z))
    tiled = np.asarray(decode_tiled(decode_fn, z, tile=16, overlap=8, scale=2))
    assert tiled.shape == full.shape
    np.testing.assert_allclose(tiled, full, atol=1e-5)


@pytest.mark.slow
def test_decode_tiled_real_decoder_smoke():
    """With a real (GroupNorm-global) decoder, tiling shifts per-tile norm
    stats; assert shape/finiteness and rough agreement scale only."""
    cfg = VAEConfig(double_z=True, z_channels=4, resolution=64, ch=32,
                    ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=())
    dec = Decoder(cfg)
    z = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 24, 40, 4)).astype(np.float32))
    params = dec.init(jax.random.PRNGKey(0), z[:, :8, :8])["params"]
    decode_fn = lambda zt: dec.apply({"params": params}, zt)
    tiled = np.asarray(decode_tiled(decode_fn, z, tile=16, overlap=8, scale=2))
    assert tiled.shape == (1, 48, 80, 3)
    assert np.all(np.isfinite(tiled))
