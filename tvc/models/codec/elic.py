"""ELIC-style learned image codec in Flax (NHWC, TPU-native).

Re-design of the reference `TestModel` (Network.py:74-640): analysis/synthesis
transforms with residual-bottleneck groups and attention, hyperprior,
channel-conditional (cc) transforms over uneven groups [16,16,32,64,192], a
checkerboard spatial context model, and per-slice parameter aggregation.

Device/host split (TPU-first, SURVEY.md §7.1):
- everything neural is a jittable method on this module;
- the serial rANS bitstream work lives in `tvc.models.codec.coding` on the
  host, calling the per-slice methods through cached jit closures;
- the training forward (`__call__`) and entropy-estimation path (`inference`)
  are single fused programs with no host round-trips — checkerboard scatter
  is mask arithmetic, not strided assignment.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import CodecConfig
from tvc.entropy.factorized import FactorizedEntropy
from tvc.entropy.gaussian import gaussian_likelihood
from tvc.models.codec.checkerboard import (
    keep_anchor,
    keep_nonanchor,
    pack_anchor,
    pack_nonanchor,
    unpack_anchor,
    unpack_nonanchor,
)
from tvc.models.codec.layers import (
    AttentionBlock,
    CheckboardMaskedConv,
    Conv,
    Conv1x1,
    Conv3x3,
    Deconv,
    ResidualBottleneckBlock,
)
from tvc.ops.quantize import ste_round

Dtype = Any


class ELICModel(nn.Module):
    """ELIC codec (reference TestModel, Network.py:74-190)."""

    N: int = 192
    M: int = 320
    groups: Tuple[int, ...] = (16, 16, 32, 64, 192)
    dtype: Dtype = jnp.float32

    @property
    def num_slices(self) -> int:
        return len(self.groups)

    def setup(self):
        N, M, dt = self.N, self.M, self.dtype
        # --- g_a (Network.py:88-104), submodule names mirror torch indices ---
        self.g_a_layers = [
            Conv(N, 5, 2, dtype=dt, name="g_a_0"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_a_1"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_a_2"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_a_3"),
            Conv(N, 5, 2, dtype=dt, name="g_a_4"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_a_5"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_a_6"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_a_7"),
            AttentionBlock(N, dtype=dt, name="g_a_8"),
            Conv(N, 5, 2, dtype=dt, name="g_a_9"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_a_10"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_a_11"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_a_12"),
            Conv(M, 5, 2, dtype=dt, name="g_a_13"),
            AttentionBlock(M, dtype=dt, name="g_a_14"),
        ]
        # --- g_s (Network.py:106-122) ---
        self.g_s_layers = [
            AttentionBlock(M, dtype=dt, name="g_s_0"),
            Deconv(N, 5, 2, dtype=dt, name="g_s_1"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_s_2"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_s_3"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_s_4"),
            Deconv(N, 5, 2, dtype=dt, name="g_s_5"),
            AttentionBlock(N, dtype=dt, name="g_s_6"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_s_7"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_s_8"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_s_9"),
            Deconv(N, 5, 2, dtype=dt, name="g_s_10"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_s_11"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_s_12"),
            ResidualBottleneckBlock(N, dtype=dt, name="g_s_13"),
            Deconv(3, 5, 2, dtype=dt, name="g_s_14"),
        ]
        # --- h_a / h_s (Network.py:124-138); relus are parameter-free ---
        # The hyper/context path computes the entropy parameters that symbols
        # are rounded against: full-f32 conv accumulation (HIGHEST) so that
        # converted checkpoints reproduce the reference's mu/sigma exactly.
        # These convs run on <=8x8 latents, so the precision costs ~nothing;
        # the big g_a/g_s transforms keep the backend default.
        import jax.lax as _lax

        hp = _lax.Precision.HIGHEST
        self.h_a_0 = Conv3x3(N, dtype=dt, precision=hp, name="h_a_0")
        self.h_a_2 = Conv(N, 5, 2, dtype=dt, precision=hp, name="h_a_2")
        self.h_a_4 = Conv(N, 5, 2, dtype=dt, precision=hp, name="h_a_4")
        self.h_s_0 = Deconv(N, 5, 2, dtype=dt, precision=hp, name="h_s_0")
        self.h_s_2 = Deconv(N * 3 // 2, 5, 2, dtype=dt, precision=hp, name="h_s_2")
        self.h_s_4 = Conv3x3(2 * self.M, dtype=dt, precision=hp, name="h_s_4")

        # --- cc transforms (Network.py:140-149): slices 1..4 ---
        g = (0,) + tuple(self.groups)
        cc = []
        for i in range(1, self.num_slices):
            in_ch = g[min(1, i) if i > 0 else 0] + g[i if i > 1 else 0]
            cc.append([
                Conv(224, 5, 1, dtype=dt, precision=hp, name=f"cc_{i - 1}_0"),
                Conv(128, 5, 1, dtype=dt, precision=hp, name=f"cc_{i - 1}_2"),
                Conv(g[i + 1] * 2, 5, 1, dtype=dt, precision=hp, name=f"cc_{i - 1}_4"),
            ])
        self.cc_layers = cc

        # --- checkerboard context convs (Network.py:151-155) ---
        self.ctx_layers = [
            CheckboardMaskedConv(2 * self.groups[i], 5, dtype=dt, name=f"ctx_{i}")
            for i in range(self.num_slices)
        ]

        # --- parameter aggregation MLPs (Network.py:157-166) ---
        agg = []
        for i in range(self.num_slices):
            agg.append([
                Conv1x1(640, dtype=dt, precision=hp, name=f"agg_{i}_0"),
                Conv1x1(512, dtype=dt, precision=hp, name=f"agg_{i}_2"),
                Conv1x1(self.groups[i] * 2, dtype=dt, precision=hp, name=f"agg_{i}_4"),
            ])
        self.agg_layers = agg

        self.entropy_bottleneck = FactorizedEntropy(channels=self.N, name="entropy_bottleneck")

    # ------------- transform passes -------------

    def g_a(self, x: jax.Array) -> jax.Array:
        for layer in self.g_a_layers:
            x = layer(x)
        return x

    def g_s(self, y: jax.Array) -> jax.Array:
        for layer in self.g_s_layers:
            y = layer(y)
        return y

    def h_a(self, y: jax.Array) -> jax.Array:
        h = nn.relu(self.h_a_0(y))
        h = nn.relu(self.h_a_2(h))
        return self.h_a_4(h)

    def h_s(self, z_hat: jax.Array) -> jax.Array:
        h = nn.relu(self.h_s_0(z_hat))
        h = nn.relu(self.h_s_2(h))
        return self.h_s_4(h)

    def cc_transform(self, slice_index: int, support: jax.Array) -> jax.Array:
        """Channel support -> (mean, scale) stack for slice_index (>= 1)."""
        l0, l2, l4 = self.cc_layers[slice_index - 1]
        h = nn.relu(l0(support))
        h = nn.relu(l2(h))
        return l4(h)

    def context(self, slice_index: int, y_half: jax.Array) -> jax.Array:
        return self.ctx_layers[slice_index](y_half)

    def aggregate(self, slice_index: int, ctx_and_support: jax.Array) -> jax.Array:
        l0, l2, l4 = self.agg_layers[slice_index]
        h = nn.relu(l0(ctx_and_support))
        h = nn.relu(l2(h))
        return l4(h)

    # ------------- composite stages used by the host coder -------------

    def encode_transforms(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        y = self.g_a(x)
        z = self.h_a(y)
        return y, z

    def hyper_params(self, z_hat: jax.Array) -> Tuple[jax.Array, jax.Array]:
        lm, ls = jnp.split(self.h_s(z_hat), 2, axis=-1)
        return lm, ls

    def slice_support(self, slice_index: int, y_hat_first: Optional[jax.Array],
                      y_hat_prev: Optional[jax.Array], latent_means: jax.Array,
                      latent_scales: jax.Array) -> jax.Array:
        """Build the per-slice support tensor (Network.py:360-376)."""
        if slice_index == 0:
            return jnp.concatenate([latent_means, latent_scales], axis=-1)
        if slice_index == 1:
            sup = y_hat_first
        else:
            sup = jnp.concatenate([y_hat_first, y_hat_prev], axis=-1)
        ch = self.cc_transform(slice_index, sup)
        ch_mean, ch_scale = jnp.split(ch, 2, axis=-1)
        return jnp.concatenate([ch_mean, ch_scale, latent_means, latent_scales], axis=-1)

    def anchor_params(self, slice_index: int, support: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Aggregate with zero spatial context (phase 1, Network.py:380-383)."""
        b, h, w, _ = support.shape
        ctx = jnp.zeros((b, h, w, 2 * self.groups[slice_index]), support.dtype)
        mu, sc = jnp.split(self.aggregate(slice_index, jnp.concatenate([ctx, support], -1)), 2, -1)
        return mu, sc

    def nonanchor_params(self, slice_index: int, y_anchor_decoded: jax.Array,
                         support: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Masked-conv context from decoded anchors (phase 2, Network.py:406-409)."""
        ctx = self.context(slice_index, y_anchor_decoded)
        mu, sc = jnp.split(self.aggregate(slice_index, jnp.concatenate([ctx, support], -1)), 2, -1)
        return mu, sc

    def synthesize(self, y_hat: jax.Array, clamp: bool = True) -> jax.Array:
        x = self.g_s(y_hat)
        return jnp.clip(x, 0.0, 1.0) if clamp else x

    # ------------- fused forwards -------------

    def _slice_loop(self, y: jax.Array, latent_means: jax.Array, latent_scales: jax.Array,
                    noisequant: bool, rng: Optional[jax.Array]):
        """Shared two-phase checkerboard loop (Network.py:222-293 / 570-625).

        Returns (y_hat_for_gs, y_likelihoods)."""
        splits = np.cumsum(self.groups)[:-1]
        y_slices = jnp.split(y, splits, axis=-1)

        y_hat_first = None
        y_hat_prev = None
        y_hat_gs: List[jax.Array] = []
        y_lk: List[jax.Array] = []

        for i, y_slice in enumerate(y_slices):
            support = self.slice_support(i, y_hat_first, y_hat_prev, latent_means, latent_scales)

            # phase 1: anchors with zero context
            mu_a, sc_a = self.anchor_params(i, support)
            y_anchor = keep_anchor(y_slice)
            if noisequant:
                rng, k1, k2 = jax.random.split(rng, 3)
                ya_q = y_anchor + jax.random.uniform(k1, y_anchor.shape, y_anchor.dtype, -0.5, 0.5)
                ya_gs = ste_round(y_anchor)
            else:
                ya_q = ste_round(y_anchor - mu_a) + mu_a
                ya_gs = ya_q
            ya_q = keep_anchor(ya_q)
            ya_gs = keep_anchor(ya_gs)

            # phase 2: non-anchors conditioned on quantized anchors
            mu_n, sc_n = self.nonanchor_params(i, ya_q, support)
            y_nonanchor = keep_nonanchor(y_slice)
            if noisequant:
                yn_q = y_nonanchor + jax.random.uniform(k2, y_nonanchor.shape, y_nonanchor.dtype, -0.5, 0.5)
                yn_gs = ste_round(y_nonanchor)
            else:
                yn_q = ste_round(y_nonanchor - mu_n) + mu_n
                yn_gs = yn_q
            yn_q = keep_nonanchor(yn_q)
            yn_gs = keep_nonanchor(yn_gs)

            # merged (mean, scale) maps over the checkerboard
            mu = keep_anchor(mu_a) + keep_nonanchor(mu_n)
            sc = keep_anchor(sc_a) + keep_nonanchor(sc_n)
            y_lk.append(gaussian_likelihood(y_slice, sc, mu))

            y_hat_slice = ya_q + yn_q
            y_hat_gs.append(ya_gs + yn_gs)
            if i == 0:
                y_hat_first = y_hat_slice
            y_hat_prev = y_hat_slice

        return jnp.concatenate(y_hat_gs, axis=-1), jnp.concatenate(y_lk, axis=-1)

    def __call__(self, x: jax.Array, noisequant: bool = False,
                 rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        """Training/eval rate-distortion forward (Network.py:192-305)."""
        y = self.g_a(x)
        z = self.h_a(y)
        if noisequant:
            assert rng is not None
            rng, kz = jax.random.split(rng)
            z_hat, z_lk = self.entropy_bottleneck(z, training=True, rng=kz)
        else:
            _, z_lk = self.entropy_bottleneck(z)
            med = self.entropy_bottleneck.medians().astype(z.dtype)
            z_hat = ste_round(z - med) + med

        latent_means, latent_scales = self.hyper_params(z_hat)
        y_hat, y_lk = self._slice_loop(y, latent_means, latent_scales, noisequant, rng)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lk, "z": z_lk}}

    def compress_forward(self, x: jax.Array, return_recon: bool = False) -> Dict[str, Any]:
        """Single fused compress-side program (TPU redesign of Network.py:336-441).

        The reference interleaves 10 host rANS calls with the per-slice NN
        stages; but on the *encoder* side every "decoded" symbol is just
        round(y - mu) + mu — computable on device without the bitstream. So
        the whole chain (g_a, h_a, z quantize, h_s, 5-slice two-phase
        parameter/quantize loop, optional g_s) compiles to ONE XLA program,
        and the host rANS runs purely on the fetched symbols/params
        afterwards. The receiver (`decompress`) keeps the inherent serial
        device<->host interleave.

        Returns packed tensors for the host coder:
        - z_sym: round(z - median) (B,h,w,N) — the z bitstream symbols;
        - y_packed: [pack_anchor(y) ‖ pack_nonanchor(y)] (B,H,W/2,2M);
        - pa: [pack_anchor(mu_a) per slice ‖ pack_anchor(sc_a) per slice];
        - pn: same for the non-anchor phase;
        - x_hat (if return_recon): sender fast-path reconstruction, equal to
          decompress() output by construction.
        """
        y = self.g_a(x)
        z = self.h_a(y)
        med = self.entropy_bottleneck.medians().astype(z.dtype)
        z_sym = jnp.round(z - med)
        z_hat = z_sym + med
        lm, ls = self.hyper_params(z_hat)

        splits = np.cumsum(self.groups)[:-1]
        y_slices = jnp.split(y, splits, axis=-1)
        y_hat_first = y_hat_prev = None
        mu_a_p: List[jax.Array] = []
        sc_a_p: List[jax.Array] = []
        mu_n_p: List[jax.Array] = []
        sc_n_p: List[jax.Array] = []
        y_hat_slices: List[jax.Array] = []
        for i, ys in enumerate(y_slices):
            sup = self.slice_support(i, y_hat_first, y_hat_prev, lm, ls)
            mu_a, sc_a = self.anchor_params(i, sup)
            # decoded anchors (= what the receiver reconstructs: sym + mu)
            ya_q = keep_anchor(jnp.round(ys - mu_a) + mu_a)
            mu_n, sc_n = self.nonanchor_params(i, ya_q, sup)
            yn_q = keep_nonanchor(jnp.round(ys - mu_n) + mu_n)
            y_hat_slice = ya_q + yn_q
            if i == 0:
                y_hat_first = y_hat_slice
            y_hat_prev = y_hat_slice
            y_hat_slices.append(y_hat_slice)
            mu_a_p.append(pack_anchor(mu_a))
            sc_a_p.append(pack_anchor(sc_a))
            mu_n_p.append(pack_nonanchor(mu_n))
            sc_n_p.append(pack_nonanchor(sc_n))

        out = {
            "z_sym": z_sym,
            "y_packed": jnp.concatenate([pack_anchor(y), pack_nonanchor(y)], axis=-1),
            "pa": jnp.concatenate(mu_a_p + sc_a_p, axis=-1),
            "pn": jnp.concatenate(mu_n_p + sc_n_p, axis=-1),
        }
        if return_recon:
            out["x_hat"] = self.synthesize(jnp.concatenate(y_hat_slices, axis=-1))
        return out

    def inference(self, x: jax.Array) -> Dict[str, Any]:
        """Entropy-estimation path (Network.py:534-640): STE everywhere,
        bpp from likelihoods, no bitstreams. Fully fused."""
        y = self.g_a(x)
        z = self.h_a(y)
        _, z_lk = self.entropy_bottleneck(z)
        med = self.entropy_bottleneck.medians().astype(z.dtype)
        z_hat = ste_round(z - med) + med
        latent_means, latent_scales = self.hyper_params(z_hat)
        y_hat, y_lk = self._slice_loop(y, latent_means, latent_scales, False, None)
        x_hat = self.g_s(y_hat)
        return {"x_hat": x_hat, "likelihoods": {"y": y_lk, "z": z_lk}}


def make_elic(cfg: CodecConfig | None = None, dtype=jnp.float32) -> ELICModel:
    cfg = cfg or CodecConfig()
    return ELICModel(N=cfg.N, M=cfg.M, groups=tuple(cfg.groups), dtype=dtype)


if __name__ == "__main__":
    # codec smoke test / profiler (reference: Network.py:646-664 __main__):
    # forward a random 256x256 image, print output shape + params + FLOPs.
    import jax as _jax

    from tvc.utils.profiler import cost_analysis, count_params

    model = make_elic()
    x = jnp.zeros((1, 256, 256, 3))
    variables = model.init(_jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    print("x_hat:", out["x_hat"].shape)
    print(f"params: {count_params(variables) / 1e6:.2f}M")
    try:
        ca = cost_analysis(lambda v, xx: model.apply(v, xx)["x_hat"], variables, x)
        print(f"flops: {ca.get('flops', float('nan')) / 1e9:.2f} GFLOP")
    except Exception as e:  # cost analysis availability differs per backend
        print("flops: unavailable:", e)
