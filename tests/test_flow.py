"""Flow prior tests: invertibility, logdet correctness vs autodiff jacobian,
NLL training, converter structure from a fake net2net state dict, and the
train_prior loop end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.io import torch_import as ti
from feed_forward_vqgan_clip_tpu.models.flow import (
    ConditionalFlatCouplingFlow,
    Prior,
    build_prior_model,
    nll_loss,
)

C, D = 8, 6  # flow channels, conditioning dim


def _flow(n_flows=2):
    return ConditionalFlatCouplingFlow(
        in_channels=C, conditioning_dim=D, embedding_dim=4, hidden_dim=16,
        hidden_depth=1, n_flows=n_flows,
    )


def _init(flow, seed=0):
    return flow.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, C)), jnp.zeros((1, D))
    )


class TestFlowCore:
    def test_forward_reverse_roundtrip(self, rng):
        flow = _flow()
        v = _init(flow)
        x = jnp.asarray(rng.normal(size=(4, C)), jnp.float32)
        cond = jnp.asarray(rng.normal(size=(4, D)), jnp.float32)
        z, logdet = flow.apply(v, x, cond)
        x_back = flow.apply(v, z, cond, method=flow.reverse)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)
        assert logdet.shape == (4,)

    def test_logdet_matches_jacobian(self, rng):
        flow = _flow(n_flows=1)
        v = _init(flow)
        x = jnp.asarray(rng.normal(size=(1, C)), jnp.float32)
        cond = jnp.asarray(rng.normal(size=(1, D)), jnp.float32)
        _, logdet = flow.apply(v, x, cond)
        J = jax.jacobian(lambda xx: flow.apply(v, xx[None], cond)[0][0])(x[0])
        _, true_logdet = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(float(logdet[0]), true_logdet, rtol=1e-4)

    def test_conditioning_matters(self, rng):
        flow = _flow()
        v = _init(flow)
        x = jnp.asarray(rng.normal(size=(2, C)), jnp.float32)
        c1 = jnp.zeros((2, D))
        c2 = jnp.ones((2, D))
        z1, _ = flow.apply(v, x, c1)
        z2, _ = flow.apply(v, x, c2)
        assert not np.allclose(np.asarray(z1), np.asarray(z2))

    def test_sample_shape(self, rng):
        flow = _flow()
        prior = Prior(flow, _init(flow))
        cond = jnp.asarray(rng.normal(size=(5, D)), jnp.float32)
        s = prior.sample(jax.random.PRNGKey(0), cond)
        assert s.shape == (5, C)

    def test_nll_loss_values(self):
        z = jnp.zeros((3, C))
        loss, aux = nll_loss(z, jnp.zeros((3,)))
        np.testing.assert_allclose(float(loss), 0.0)
        z = jnp.ones((3, C))
        loss, _ = nll_loss(z, jnp.full((3,), 2.0))
        np.testing.assert_allclose(float(loss), 0.5 * C - 2.0)


class TestFlowTraining:
    def test_nll_decreases(self, rng):
        """Fit a simple conditional Gaussian: y = 2*cond[:, :C//?]-ish signal."""
        import optax

        flow = _flow(n_flows=3)
        v = _init(flow)
        params, buffers = v["params"], v["buffers"]
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        def loss_fn(p, x, cond):
            z, ld = flow.apply({"params": p, "buffers": buffers}, x, cond)
            return nll_loss(z, ld)[0]

        @jax.jit
        def step(p, opt, x, cond):
            l, g = jax.value_and_grad(loss_fn)(p, x, cond)
            u, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, u), opt, l

        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(60):
            key, k1, k2 = jax.random.split(key, 3)
            cond = jax.random.normal(k1, (64, D))
            x = jnp.tile(cond.sum(1, keepdims=True), (1, C)) * 0.5 + 0.1 * jax.random.normal(k2, (64, C))
            params, opt, l = step(params, opt, x, cond)
            losses.append(float(l))
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 1.0


class TestConverter:
    def test_fake_net2net_state_dict(self, rng):
        # modest weight scale: unscaled N(0,1) fakes amplify t-net outputs to
        # O(100+), which turns the exact inverse into float32 cancellation noise
        g = lambda *s: (0.2 * rng.normal(size=s)).astype(np.float32)
        hidden, hd, cd, emb = 16, 1, 2, 4
        n_flows = 2

        def fc(prefix, din, dout, depth):
            d = {f"{prefix}.main.0.weight": g(hidden, din), f"{prefix}.main.0.bias": g(hidden)}
            for i in range(depth):
                d[f"{prefix}.main.{2*(i+1)}.weight"] = g(hidden, hidden)
                d[f"{prefix}.main.{2*(i+1)}.bias"] = g(hidden)
            d[f"{prefix}.main.{2*(depth+1)}.weight"] = g(dout, hidden)
            d[f"{prefix}.main.{2*(depth+1)}.bias"] = g(dout)
            return d

        sd = fc("embedder", D, emb, cd)
        for i in range(n_flows):
            p = f"sub_layers.{i}"
            sd[f"{p}.norm_layer.loc"] = g(1, C, 1, 1)
            sd[f"{p}.norm_layer.scale"] = np.abs(g(1, C, 1, 1)) + 0.5
            sd[f"{p}.shuffle.forward_shuffle_idx"] = np.random.RandomState(i).permutation(C).astype(np.int64)
            for j in range(2):
                sd.update(fc(f"{p}.coupling.s.{j}", C // 2 + emb, C // 2, hd))
                sd.update(fc(f"{p}.coupling.t.{j}", C // 2 + emb, C // 2, hd))

        variables = ti.convert_flow(sd, n_flows=n_flows, conditioning_depth=cd)
        flow = ConditionalFlatCouplingFlow(
            in_channels=C, conditioning_dim=D, embedding_dim=emb,
            hidden_dim=hidden, hidden_depth=hd, n_flows=n_flows,
            conditioning_depth=cd, conditioning_hidden_dim=hidden,
        )
        x = jnp.asarray(rng.normal(size=(3, C)), jnp.float32)
        cond = jnp.asarray(rng.normal(size=(3, D)), jnp.float32)
        z, logdet = flow.apply(variables, x, cond)
        assert np.isfinite(np.asarray(z)).all()
        x_back = flow.apply(variables, z, cond, method=flow.reverse)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)

    def test_build_prior_model_config_shapes(self):
        m = build_prior_model(
            {"model": {"embedding_dim": 4, "hidden_dim": 8, "hidden_depth": 1, "n_flows": 2}},
            input_size=D, output_size=C,
        )
        assert m.in_channels == C and m.conditioning_dim == D


@pytest.mark.slow
class TestTrainPriorE2E:
    def test_train_prior_loop(self, tmp_path, rng):
        np.savez(
            tmp_path / "pairs.npz",
            x=rng.normal(size=(32, D)).astype(np.float32),
            y=rng.normal(size=(32, C)).astype(np.float32),
        )
        from feed_forward_vqgan_clip_tpu.config import make_config
        from feed_forward_vqgan_clip_tpu.train.prior import train_prior

        cfg = make_config(
            folder=str(tmp_path),
            data={"path": str(tmp_path / "pairs.npz"), "batch_size": 16},
            model={"embedding_dim": 4, "hidden_dim": 16, "hidden_depth": 1, "n_flows": 2},
            optim={"lr": 1e-3, "epochs": 100, "clip_grad_norm": 1.0},
            logging={"log_interval": 2},
            max_steps=3,
        )
        state = train_prior(cfg)
        assert int(state.step) == 3
        assert (tmp_path / "checkpoint" / "params.msgpack").exists()

        from feed_forward_vqgan_clip_tpu.models.flow import load_prior_model

        prior = load_prior_model(str(tmp_path / "checkpoint"))
        s = prior.sample(jax.random.PRNGKey(0), jnp.zeros((2, D)))
        assert s.shape == (2, C)
