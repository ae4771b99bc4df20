"""Stroke (synthetic MNIST-style) image-classification prior.

Behavioral parity: reference priors/stroke.py.
  * ``mnist_prior`` (stroke.py:9-66): per *class*, sample a stroke program —
    1..3 strokes, each with a length, a start point, and a direction chosen so
    the stroke endpoint stays inside the canvas (retry loop at stroke.py:23-37).
    Per *image render*, sample a stroke width, a global offset, and a per-stroke
    endpoint jitter, draw the lines at a random 200..255 brightness per pixel,
    and apply a Gaussian blur (stroke.py:46-63).
  * ``get_batch`` (stroke.py:80-114): per batch element sample a fresh class
    alphabet; labels are uniform per position, or — with
    ``only_train_for_last_idx`` — a balanced shuffled set of (seq_len-1)
    support images plus one random query, targets −100 except at the last
    position (stroke.py:97-103, pairs with the CE criterion's ignore_index).

TPU-native design (not a port): the PIL ``ImageDraw.line`` + GaussianBlur
renderer becomes a pure-jnp **capsule rasterizer** — each stroke is the set of
pixels within width/2 of its line segment (point-to-segment distance on the
pixel grid), strokes are combined by max, per-pixel brightness is sampled in
[200/255, 1], and the blur is a small separable Gaussian convolution. Fully
vmapped over (batch, sequence, strokes); the reference's host-side
retry loop is replaced by sampling K candidate (start, length, angle) triples
per stroke and selecting the first in-bounds one (clipping as fallback).

Known reference bug NOT replicated: the per-render closure mutates the class
program (``stroke_directions.append`` inside ``g``, stroke.py:58) — a memory
leak with no visual effect.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


def _point_segment_distance(p, a, b):
    """Distance from points p (..., 2) to segment a-b (2,)."""
    ab = b - a
    denom = jnp.maximum(jnp.dot(ab, ab), 1e-8)
    t = jnp.clip(jnp.einsum("...d,d->...", p - a, ab) / denom, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return jnp.linalg.norm(p - proj, axis=-1)


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / max(sigma, 1e-6)) ** 2)
    return k / k.sum()


@dataclasses.dataclass(frozen=True)
class StrokePrior:
    """``num_features`` must be a square (size²); ``num_outputs`` is the
    number of classes (reference stroke.py:116-117 fixes it to 2)."""

    num_features: int = 784
    num_outputs: int = 2
    min_max_strokes: tuple = (1, 3)
    min_max_len: tuple = (5 / 28, 20 / 28)
    min_max_start: tuple = (2 / 28, 25 / 28)
    min_max_width: tuple = (1 / 28, 4 / 28)
    max_offset: float = 4 / 28
    max_target_offset: float = 2 / 28
    only_train_for_last_idx: bool = False
    normalize_x: bool = False
    blur_sigma: float = 0.2
    num_direction_candidates: int = 8  # replaces the host retry loop

    @property
    def size(self) -> int:
        size = math.isqrt(self.num_features)
        assert size * size == self.num_features, (
            "num_features needs to be the square of an integer."
        )  # parity: stroke.py:88
        return size

    # ---- class programs ----------------------------------------------------
    def _sample_class_programs(self, key, shape):
        """Sample stroke programs for ``shape``-many alphabets.

        Returns dict of arrays with leading dims ``shape + (C, S)`` where C =
        num classes, S = max strokes: start (.., 2), length, angle, active.
        """
        size = self.size
        C, S = self.num_outputs, self.min_max_strokes[1]
        K = self.num_direction_candidates
        ks = jax.random.split(key, 5)
        lead = tuple(shape) + (C, S)

        num_strokes = jax.random.randint(
            ks[0], tuple(shape) + (C,), self.min_max_strokes[0],
            self.min_max_strokes[1] + 1,
        )
        active = jnp.arange(S)[None] < num_strokes[..., None]

        lo_l = int(size * self.min_max_len[0])
        hi_l = int(size * self.min_max_len[1])
        lo_s = int(size * self.min_max_start[0])
        hi_s = int(size * self.min_max_start[1])
        # K candidate (start, length, angle) triples per stroke; pick the
        # first whose endpoint is in bounds (parity: retry loop stroke.py:23-37
        # regenerates start+length every 3 direction attempts).
        starts = jax.random.randint(
            ks[1], lead + (K, 2), lo_s, hi_s + 1
        ).astype(jnp.float32)
        lengths = jax.random.randint(ks[2], lead + (K,), lo_l, hi_l + 1).astype(
            jnp.float32
        )
        angles = jax.random.uniform(ks[3], lead + (K,)) * (2 * math.pi)
        ends = starts + lengths[..., None] * jnp.stack(
            [jnp.cos(angles), jnp.sin(angles)], axis=-1
        )
        ok = jnp.all((ends >= 0) & (ends <= size - 1), axis=-1)  # (.., K)
        first_ok = jnp.argmax(ok, axis=-1)  # 0 if none ok (endpoint clips)
        length = jnp.take_along_axis(lengths, first_ok[..., None], axis=-1)[
            ..., 0
        ]
        angle = jnp.take_along_axis(angles, first_ok[..., None], axis=-1)[..., 0]
        start = jnp.take_along_axis(
            starts, first_ok[..., None, None], axis=-2
        )[..., 0, :]
        return {
            "start": start,  # (.., C, S, 2)
            "length": length,  # (.., C, S)
            "angle": angle,  # (.., C, S)
            "active": active,  # (.., C, S)
        }

    # ---- rendering ---------------------------------------------------------
    def _render(self, key, start, length, angle, active):
        """Render one image from a stroke program. All args per-stroke (S,…)."""
        size = self.size
        S = self.min_max_strokes[1]
        k_w, k_off, k_jit, k_bright = jax.random.split(key, 4)

        width = jax.random.randint(
            k_w, (), int(size * self.min_max_width[0]),
            int(size * self.min_max_width[1]) + 1,
        ).astype(jnp.float32)
        off_max = int(size * self.max_offset)
        offset = jax.random.randint(k_off, (2,), -off_max, off_max + 1).astype(
            jnp.float32
        )
        tgt_max = int(size * self.max_target_offset)
        jitter = jax.random.randint(k_jit, (S, 2), -tgt_max, tgt_max + 1).astype(
            jnp.float32
        )

        a = start + offset[None, :]
        vel = length[:, None] * jnp.stack(
            [jnp.cos(angle), jnp.sin(angle)], axis=-1
        )
        b = a + vel + jitter

        # Pixel grid: PIL draws line coords as (x, y) = (col, row).
        cols, rows = jnp.meshgrid(jnp.arange(size), jnp.arange(size))
        pix = jnp.stack([cols, rows], axis=-1).astype(jnp.float32)  # (H, W, 2)

        dist = jax.vmap(
            lambda aa, bb: _point_segment_distance(pix, aa, bb)
        )(a, b)  # (S, H, W)
        # Anti-aliased capsule: full intensity inside width/2, 1-px falloff.
        cover = jnp.clip(width / 2.0 + 0.5 - dist, 0.0, 1.0)
        cover = jnp.where(active[:, None, None], cover, 0.0)
        cover = jnp.max(cover, axis=0)  # (H, W)

        brightness = jax.random.uniform(
            k_bright, (size, size), minval=200.0 / 255.0, maxval=1.0
        )
        img = cover * brightness

        # Separable Gaussian blur (ImageFilter.GaussianBlur(.2), stroke.py:63).
        kern = _gaussian_kernel1d(self.blur_sigma, radius=1)
        img = jnp.apply_along_axis(
            lambda r: jnp.convolve(r, kern, mode="same"), 0, img
        )
        img = jnp.apply_along_axis(
            lambda r: jnp.convolve(r, kern, mode="same"), 1, img
        )
        if self.normalize_x:
            img = (img - img.mean()) / (img.std() + 1e-6)
        return img.reshape(-1)

    # ---- labels ------------------------------------------------------------
    def _sample_labels(self, key, seq_len):
        C = self.num_outputs
        if self.only_train_for_last_idx:
            assert (seq_len - 1) % C == 0  # parity: stroke.py:90-91
            k_perm, k_q = jax.random.split(key)
            support = jnp.tile(jnp.arange(C), (seq_len - 1) // C)
            support = jax.random.permutation(k_perm, support)
            query = jax.random.randint(k_q, (), 0, C)
            labels = jnp.concatenate([support, query[None]])
            target = jnp.full((seq_len,), -100, jnp.int32).at[-1].set(query)
        else:
            labels = jax.random.randint(key, (seq_len,), 0, C)
            target = labels
        return labels.astype(jnp.float32), target.astype(jnp.float32)

    # ---- Prior protocol ----------------------------------------------------
    def sample(self, key: jax.Array, batch_size: int, seq_len: int):
        k_prog, k_lab, k_render = jax.random.split(key, 3)
        progs = self._sample_class_programs(k_prog, (batch_size,))
        labels, targets = jax.vmap(
            lambda k: self._sample_labels(k, seq_len)
        )(jax.random.split(k_lab, batch_size))

        render_keys = jax.random.split(k_render, batch_size * seq_len).reshape(
            batch_size, seq_len, -1
        )

        def render_one(prog, label, rkey):
            c = label.astype(jnp.int32)
            return self._render(
                rkey,
                prog["start"][c],
                prog["length"][c],
                prog["angle"][c],
                prog["active"][c],
            )

        x = jax.vmap(  # over batch
            lambda prog, labs, rkeys: jax.vmap(  # over sequence
                lambda lab, rk: render_one(prog, lab, rk)
            )(labs, rkeys)
        )(progs, labels, render_keys)
        return x.astype(jnp.float32), labels, targets
