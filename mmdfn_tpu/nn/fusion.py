"""Fusion baselines: MFN, TFN, LMF (reference ``code/model_fusion.py``).

* MFN (Memory Fusion Network): three per-modality LSTM cells + a cross-view
  Delta-memory attention, reference ``model_fusion.py:10-120``.  The python
  time loop becomes a ``lax.scan``; all dropout keys are pre-split per step.
* TFN (Tensor Fusion Network): outer product of (1 +) projected modalities,
  reference ``model_fusion.py:123-211``.  The double ``bmm`` Kronecker builds
  become one einsum (identical C-order flattening).
* LMF (Low-rank Multimodal Fusion): per-modality rank factors,
  reference ``model_fusion.py:214-310``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdfn_tpu.nn.linear import TorchDense
from mmdfn_tpu.utils import torch_init


class MFN(nn.Module):
    """Memory Fusion Network over (B, L, 3*d) sequences -> (B, L, 3*dh + mem).

    Dims match the reference defaults (d=300, dh=100, mem=100 -> out 400).
    """

    d: int = 300
    dh: int = 100
    mem_dim: int = 100
    h_att: int = 100
    h_gamma: int = 100
    att_dropout: float = 0.2
    gamma_dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, L, _ = x.shape
        d, dh = self.d, self.dh
        total_h = 3 * dh
        att_in = total_h * 2
        init = torch_init.rnn_uniform(dh)

        cells = {}
        for name in ("l", "a", "v"):
            cells[name] = dict(
                w_ih=self.param(f"lstm_{name}_w_ih", init, (d, 4 * dh)),
                w_hh=self.param(f"lstm_{name}_w_hh", init, (dh, 4 * dh)),
                b_ih=self.param(f"lstm_{name}_b_ih", init, (4 * dh,)),
                b_hh=self.param(f"lstm_{name}_b_hh", init, (4 * dh,)),
            )

        def mk_dense(name, in_dim, out_dim):
            k = self.param(f"{name}_kernel", torch_init.linear_kernel, (in_dim, out_dim))
            b = self.param(f"{name}_bias", torch_init.linear_bias(in_dim), (out_dim,))
            return k, b

        att1_1 = mk_dense("att1_fc1", att_in, self.h_att)
        att1_2 = mk_dense("att1_fc2", self.h_att, att_in)
        att2_1 = mk_dense("att2_fc1", att_in, self.h_att)
        att2_2 = mk_dense("att2_fc2", self.h_att, self.mem_dim)
        g1_1 = mk_dense("gamma1_fc1", att_in + self.mem_dim, self.h_gamma)
        g1_2 = mk_dense("gamma1_fc2", self.h_gamma, self.mem_dim)
        g2_1 = mk_dense("gamma2_fc1", att_in + self.mem_dim, self.h_gamma)
        g2_2 = mk_dense("gamma2_fc2", self.h_gamma, self.mem_dim)

        use_dropout = not deterministic
        root = self.make_rng("dropout") if use_dropout else jax.random.PRNGKey(0)
        keys = jax.random.split(root, L * 4).reshape((L, 4) + jnp.shape(root))

        def dense(p, v):
            return v @ p[0] + p[1]

        def drop(v, key, rate):
            if not use_dropout:
                return v
            keep = 1.0 - rate
            return jnp.where(jax.random.bernoulli(key, keep, v.shape), v / keep, 0.0)

        def lstm_cell(p, xt, h, c):
            g = xt @ p["w_ih"] + p["b_ih"] + h @ p["w_hh"] + p["b_hh"]
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
            return h2, c2

        def step(carry, xs):
            (h_l, c_l, h_a, c_a, h_v, c_v, mem) = carry
            xt, key = xs
            x_l, x_a, x_v = xt[:, :d], xt[:, d:2 * d], xt[:, 2 * d:]
            prev_cs = jnp.concatenate([c_l, c_a, c_v], axis=-1)
            nh_l, nc_l = lstm_cell(cells["l"], x_l, h_l, c_l)
            nh_a, nc_a = lstm_cell(cells["a"], x_a, h_a, c_a)
            nh_v, nc_v = lstm_cell(cells["v"], x_v, h_v, c_v)
            new_cs = jnp.concatenate([nc_l, nc_a, nc_v], axis=-1)
            c_star = jnp.concatenate([prev_cs, new_cs], axis=-1)
            attention = jax.nn.softmax(dense(att1_2, drop(
                nn.relu(dense(att1_1, c_star)), key[0], self.att_dropout)), axis=-1)
            attended = attention * c_star
            c_hat = jnp.tanh(dense(att2_2, drop(
                nn.relu(dense(att2_1, attended)), key[1], self.att_dropout)))
            both = jnp.concatenate([attended, mem], axis=-1)
            gamma1 = jax.nn.sigmoid(dense(g1_2, drop(
                nn.relu(dense(g1_1, both)), key[2], self.gamma_dropout)))
            gamma2 = jax.nn.sigmoid(dense(g2_2, drop(
                nn.relu(dense(g2_1, both)), key[3], self.gamma_dropout)))
            mem = gamma1 * mem + gamma2 * c_hat
            out = jnp.concatenate([nh_l, nh_a, nh_v, mem], axis=-1)
            return (nh_l, nc_l, nh_a, nc_a, nh_v, nc_v, mem), out

        zeros = jnp.zeros((B, dh), x.dtype)
        mem0 = jnp.zeros((B, self.mem_dim), x.dtype)
        _, ys = jax.lax.scan(
            step, (zeros, zeros, zeros, zeros, zeros, zeros, mem0),
            (jnp.swapaxes(x, 0, 1), keys))
        return jnp.swapaxes(ys, 0, 1)


class TFN(nn.Module):
    """Tensor Fusion Network (reference ``model_fusion.py:123-211``)."""

    input_dims: Tuple[int, int, int] = (300, 300, 300)
    hidden_dims: Tuple[int, int, int] = (100, 100, 100)
    dropouts: float = 0.4
    post_fusion_dim: int = 300
    output_dim: int = 300

    @nn.compact
    def __call__(self, audio_x, video_x, text_x, deterministic: bool = True):
        ah = TorchDense(self.hidden_dims[0], name="audio_subnet")(audio_x)
        vh = TorchDense(self.hidden_dims[1], name="video_subnet")(video_x)
        th = TorchDense(self.hidden_dims[2], name="text_subnet")(text_x)
        ones = jnp.ones(ah.shape[:-1] + (1,), ah.dtype)
        a1 = jnp.concatenate([ones, ah], axis=-1)
        v1 = jnp.concatenate([ones, vh], axis=-1)
        t1 = jnp.concatenate([ones, th], axis=-1)
        fusion = jnp.einsum("...a,...v,...t->...avt", a1, v1, t1)
        fusion = fusion.reshape(fusion.shape[:-3] + (-1,))
        fusion = nn.Dropout(self.dropouts)(fusion, deterministic=deterministic)
        out = nn.relu(TorchDense(self.post_fusion_dim, name="post_fusion_layer_1")(fusion))
        out = nn.relu(TorchDense(self.output_dim, name="post_fusion_layer_2")(out))
        return out


class LMF(nn.Module):
    """Low-rank Multimodal Fusion (reference ``model_fusion.py:214-310``)."""

    input_dims: Tuple[int, int, int] = (300, 300, 300)
    hidden_dims: Tuple[int, int, int] = (300, 300, 300)
    output_dim: int = 300
    rank: int = 4

    @nn.compact
    def __call__(self, audio_x, video_x, text_x, deterministic: bool = True):
        ah = TorchDense(self.hidden_dims[0], name="audio_subnet")(audio_x)
        vh = TorchDense(self.hidden_dims[1], name="video_subnet")(video_x)
        th = TorchDense(self.hidden_dims[2], name="text_subnet")(text_x)
        ones = jnp.ones(ah.shape[:-1] + (1,), ah.dtype)
        a1 = jnp.concatenate([ones, ah], axis=-1)
        v1 = jnp.concatenate([ones, vh], axis=-1)
        t1 = jnp.concatenate([ones, th], axis=-1)

        af = self.param("audio_factor", torch_init.xavier_normal,
                        (self.rank, self.hidden_dims[0] + 1, self.output_dim))
        vf = self.param("video_factor", torch_init.xavier_normal,
                        (self.rank, self.hidden_dims[1] + 1, self.output_dim))
        tf_ = self.param("text_factor", torch_init.xavier_normal,
                         (self.rank, self.hidden_dims[2] + 1, self.output_dim))
        fw = self.param("fusion_weights", torch_init.xavier_normal, (1, self.rank))
        fb = self.param("fusion_bias", nn.initializers.zeros, (1, self.output_dim))

        fa = jnp.einsum("...i,rio->r...o", a1, af)
        fv = jnp.einsum("...i,rio->r...o", v1, vf)
        ft = jnp.einsum("...i,rio->r...o", t1, tf_)
        zy = fa * fv * ft                      # (rank, ..., out)
        out = jnp.einsum("r,r...o->...o", fw[0], zy) + fb[0]
        return out
