"""Compare pallas-f32 and xla-f32 warp adjoints against a numpy f64 ground truth."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import math
import jax, jax.numpy as jnp, numpy as np
from feed_forward_vqgan_clip_tpu.utils import enable_compilation_cache
enable_compilation_cache()
print("backend:", jax.default_backend())
from feed_forward_vqgan_clip_tpu.ops import augment as A

B, H, W = 8, 224, 224
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
wts_np = rng.normal(size=(B, H, W, 3))
wts = jnp.asarray(wts_np, jnp.float32)

key = jax.random.PRNGKey(3)
k1, k2, k3 = jax.random.split(key, 3)
ang = jax.random.uniform(k1, (B,), minval=-15., maxval=15.) * math.pi / 180
tx = jax.random.uniform(k2, (B,), minval=-0.1, maxval=0.1) * W
ty = jax.random.uniform(k3, (B,), minval=-0.1, maxval=0.1) * H
af = A._affine3(A._affine_inverse_about_center(ang, tx, ty, jnp.ones((B,)), H, W))
base = jnp.asarray([[0.,0.],[W-1.,0.],[W-1.,H-1.],[0.,H-1.]])
signs = jnp.asarray([[1,1],[-1,1],[-1,-1],[1,-1]], jnp.float32)
half = jnp.asarray([W,H], jnp.float32) * 0.35
disp = jax.random.uniform(jax.random.PRNGKey(9), (B,4,2)) * half * signs
pe = A.solve_homography(base[None]+disp, jnp.broadcast_to(base,(B,4,2)))


def gradfn(mode, m, pmode, pad, kind):
    A._WARP_VJP_MODE = mode
    return np.asarray(jax.jit(lambda im: jax.grad(
        lambda x: jnp.sum(A.warp_projective(x, m, pmode, pad, kind) * wts)
    )(im))(img))


def gt_adjoint(m_np, pmode):
    """f64 ground truth: grad[p] = sum_q w(s(q), p) * g[q] (g = wts here)."""
    m = np.asarray(m_np, np.float64)
    qx, qy = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    grad = np.zeros((B, H, W, 3), np.float64)
    for b in range(B):
        den = m[b,2,0]*qx + m[b,2,1]*qy + m[b,2,2]
        den = np.where(np.abs(den) < 1e-8, np.where(den < 0, -1e-8, 1e-8), den)
        sx = (m[b,0,0]*qx + m[b,0,1]*qy + m[b,0,2]) / den
        sy = (m[b,1,0]*qx + m[b,1,1]*qy + m[b,1,2]) / den
        if pmode == "border":
            sx = np.clip(sx, 0.0, W - 1.0)
            sy = np.clip(sy, 0.0, H - 1.0)
        x0 = np.floor(sx).astype(np.int64); y0 = np.floor(sy).astype(np.int64)
        fx = sx - x0; fy = sy - y0
        g = wts_np[b]  # (H, W, 3)
        for dy, dx, wgt in ((0,0,(1-fx)*(1-fy)), (0,1,fx*(1-fy)),
                            (1,0,(1-fx)*fy), (1,1,fx*fy)):
            px = x0 + dx; py = y0 + dy
            ok = (px >= 0) & (px < W) & (py >= 0) & (py < H)
            np.add.at(grad[b], (py[ok], px[ok]),
                      wgt[ok][:, None] * g[ok])
    return grad


for kind, m, pmode, pad in (("affine", af, "border", A._affine_pad(H, W, 15.0, 0.1)),
                            ("projective", pe, "zeros", 0)):
    gp = gradfn("pallas", m, pmode, pad, kind)
    gx = gradfn("xla", m, pmode, pad, kind)
    gt = gt_adjoint(np.asarray(m), pmode)
    dp = np.abs(gp - gt).max(); dx = np.abs(gx - gt).max()
    dpr = (np.abs(gp - gt) / (np.abs(gt) + 1.0)).max()
    dxr = (np.abs(gx - gt) / (np.abs(gt) + 1.0)).max()
    print(f"{kind}: pallas-vs-f64 max={dp:.3e} rel={dpr:.2e} | "
          f"xla-vs-f64 max={dx:.3e} rel={dxr:.2e}")
print("OK")
