"""Mapper tests. For Mixer and VitGAN, the reference implementation itself
(read-only at /root/reference, pure torch+einops) serves as the numeric oracle:
we build the torch module, convert its state dict with io/torch_import, and demand
output parity — this is exactly the path released checkpoints will take."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from feed_forward_vqgan_clip_tpu.io import torch_import as ti
from feed_forward_vqgan_clip_tpu.models.mappers import (
    Generator,
    Mixer,
    SimpleGenerator,
    XTransformer,
    build_mapper,
)


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class TestMixerParity:
    @pytest.mark.parametrize("s,c,dim,depth", [(4, 8, 32, 2), (8, 16, 64, 3)])
    def test_matches_reference(self, rng, s, c, dim, depth):
        from mlp_mixer_pytorch import Mixer as TorchMixer

        input_dim = 40
        tm = TorchMixer(
            input_dim=input_dim, image_size=s, channels=c, patch_size=1,
            dim=dim, depth=depth, dropout=0.0,
        ).eval()
        params = ti.convert_mixer(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}, depth
        )
        jm = Mixer(input_dim=input_dim, image_size=s, channels=c, dim=dim, depth=depth)
        x = rng.normal(size=(3, input_dim)).astype(np.float32)
        got = jm.apply(params, jnp.asarray(x))
        with torch.no_grad():
            want = _nhwc(tm(torch.tensor(x)))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestVitGANParity:
    def test_generator_matches_reference(self, rng):
        from vitgan import Generator as TorchGenerator

        tg = TorchGenerator(
            initialize_size=2, dim=32, blocks=2, num_heads=4, dropout=0,
            out_channels=8, input_dim=40,
        ).eval()
        params = ti.convert_vitgan_generator(
            {k: v.detach().numpy() for k, v in tg.state_dict().items()}, blocks=2
        )
        jg = Generator(
            initialize_size=2, input_dim=40, dim=32, blocks=2, num_heads=4,
            out_channels=8,
        )
        x = rng.normal(size=(2, 40)).astype(np.float32)
        got = jg.apply(params, jnp.asarray(x))
        with torch.no_grad():
            want = _nhwc(tg(torch.tensor(x)))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_simple_generator_matches_reference(self, rng):
        from vitgan import SimpleGenerator as TorchSimpleGenerator

        tg = TorchSimpleGenerator(
            size=4, dim=32, blocks=2, num_heads=4, dropout=0,
            out_channels=8, input_dim=40,
        ).eval()
        params = ti.convert_vitgan_generator(
            {k: v.detach().numpy() for k, v in tg.state_dict().items()}, blocks=2
        )
        jg = SimpleGenerator(
            size=4, input_dim=40, dim=32, blocks=2, num_heads=4, out_channels=8
        )
        x = rng.normal(size=(2, 40)).astype(np.float32)
        got = jg.apply(params, jnp.asarray(x))
        with torch.no_grad():
            want = _nhwc(tg(torch.tensor(x)))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestXTransformer:
    @pytest.mark.parametrize(
        "initial_proj,add_input", [(True, False), (False, True), (False, False)]
    )
    def test_modes_shapes(self, rng, initial_proj, add_input):
        m = XTransformer(
            input_dim=24, image_size=4, channels=8, dim=32, depth=2, heads=4,
            initial_proj=initial_proj, add_input=add_input,
        )
        x = jnp.asarray(rng.normal(size=(2, 24)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 4, 4, 8)
        # the reference's own smoke check (transformer.py:48-57): different inputs
        # must produce different outputs
        assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))


class TestFactory:
    def _cfg(self, model_type, **kw):
        cfg = dict(
            clip_model="ViT-B/32", noise_dim=0, model_type=model_type,
            dim=32, depth=2, dropout=0, vq_image_size=16,
        )
        cfg.update(kw)
        return cfg

    def test_builds_all_types(self):
        for mt, cls in [
            ("mlp_mixer", Mixer), ("vitgan", Generator),
            ("simple_vitgan", SimpleGenerator), ("xtransformer", XTransformer),
        ]:
            m = build_mapper(self._cfg(mt), vq_channels=8)
            assert isinstance(m, cls)

    def test_input_dim_includes_noise(self):
        m = build_mapper(self._cfg("mlp_mixer", noise_dim=64), vq_channels=8)
        assert m.input_dim == 512 + 64

    def test_vitgan_initialize_size(self):
        m = build_mapper(self._cfg("vitgan", vq_image_size=16), vq_channels=8)
        assert m.initialize_size == 2  # 16 // 8, main.py:461

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError):
            build_mapper(self._cfg("bogus"), vq_channels=8)

    def test_output_is_latent_grid(self, rng):
        m = build_mapper(self._cfg("mlp_mixer", vq_image_size=4), vq_channels=8)
        x = jnp.asarray(rng.normal(size=(2, 512)), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(params, x).shape == (2, 4, 4, 8)


class TestVitGANAuxParity:
    """The reference module's auxiliary classes (vitgan.py:196-357): SineLayer,
    and the Discriminator stack (L2/cdist attention with spectral renorm,
    DEncoderBlock, overlapping-patch tokenizer with the .view reinterpretation
    quirk). Dead code from `train`'s perspective but part of the public
    surface; the torch reference is the oracle."""

    def test_sine_layer_matches_reference(self, rng):
        from vitgan import SineLayer as TorchSineLayer

        tl = TorchSineLayer(6, 10, is_first=False, omega_0=30).eval()
        x = rng.normal(size=(3, 6)).astype(np.float32)
        from feed_forward_vqgan_clip_tpu.io.torch_import import convert_sine_layer
        from feed_forward_vqgan_clip_tpu.models.mappers.vitgan import SineLayer

        params = convert_sine_layer(
            {k: v.detach().numpy() for k, v in tl.state_dict().items()}
        )
        jl = SineLayer(10, is_first=False, omega_0=30.0)
        got = jl.apply(params, jnp.asarray(x))
        with torch.no_grad():
            want = tl(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_discriminator_matches_reference(self, rng):
        from vitgan import Discriminator as TorchDiscriminator

        td = TorchDiscriminator(
            in_channels=3, patch_size=2, extend_size=1, dim=16, blocks=2,
            num_heads=4, dropout=0,
        ).eval()
        from feed_forward_vqgan_clip_tpu.io.torch_import import (
            convert_vitgan_discriminator,
        )
        from feed_forward_vqgan_clip_tpu.models.mappers.vitgan import Discriminator

        params = convert_vitgan_discriminator(
            {k: v.detach().numpy() for k, v in td.state_dict().items()}, blocks=2
        )
        jd = Discriminator(patch_size=2, extend_size=1, dim=16, blocks=2, num_heads=4)
        # 20x20 keeps tokens+1 (37) within the reference's (token_dim+1)-row
        # pos table (49) — larger images overrun it in torch too (a replicated
        # quirk, see Discriminator docstring)
        x = rng.normal(size=(2, 3, 20, 20)).astype(np.float32)
        got = jd.apply(params, jnp.asarray(x).transpose(0, 2, 3, 1))
        with torch.no_grad():
            want = td(torch.tensor(x)).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_spectral_renorm_invariance(self, rng):
        # the L2 attention renormalizes to_qkv to its init spectral norm each
        # forward (vitgan.py:69-78): scaling the stored kernel while keeping
        # init_spect_norm must not change the output
        from feed_forward_vqgan_clip_tpu.models.mappers.vitgan import (
            DiscriminatorAttention,
        )

        attn = DiscriminatorAttention(dim=16, num_heads=4)
        x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
        p = attn.init(jax.random.PRNGKey(0), x)
        from feed_forward_vqgan_clip_tpu.models.mappers.vitgan import (
            init_discriminator_spectral_norms,
        )

        p = {"params": init_discriminator_spectral_norms(p["params"])}
        base = attn.apply(p, x)
        scaled = jax.tree_util.tree_map(lambda v: v, p)
        scaled["params"] = dict(scaled["params"])
        scaled["params"]["to_qkv_kernel"] = p["params"]["to_qkv_kernel"] * 3.0
        got = attn.apply(scaled, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)
