"""Omniglot few-shot episodes as a PFN prior.

Behavioral parity: reference priors/omniglot.py + datasets/omniglotNshot.py.
  * Episode = N-way k-shot support + exactly ONE query appended at the end;
    targets are −100 everywhere but the last position (priors/omniglot.py:60-70).
  * Support construction (omniglotNshot.py:185-212): choose n_way classes
    without replacement, k_shot+1 instances per class without replacement,
    optional random 90°-rotation class augmentation (RandomRotation,
    omniglotNshot.py:9-14,196-199), shuffle the support; the query is a
    uniformly random one of the selected classes (the reference shuffles
    n_way queries and keeps the first, priors/omniglot.py:62-63).
  * Random translation augmentation: each image is shifted by a random
    offset bounded by its content bounding box so no ink leaves the canvas
    (translate_omniglot, priors/omniglot.py:12-35).
  * Jonas variant: classes drawn within a single random alphabet
    (OmniglotNShotJonas, omniglotNshot.py:16-77) — enabled with
    ``alphabet_grouped=True``.
  * ``validate``: accuracy at the last position on held-out-class episodes
    (priors/omniglot.py:74-98).

TPU-native design: the class bank is one dense device array; episode
construction is pure jnp (permutations for sampling-without-replacement,
``jnp.roll`` for translation — safe because shifts are bounded by the content
margins so nothing wraps), fully vmapped over the batch and fused into the
train step like every other prior. The reference's host-side 10-episode cache
(omniglotNshot.py:172-246) is unnecessary: sampling is on-device and cheap.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.data.omniglot import ClassBank


def _content_margins(img: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """(first, last) index of rows (axis=0) / cols (axis=1) containing ink."""
    has = jnp.any(img > 1e-6, axis=1 - axis)
    n = img.shape[axis]
    first = jnp.argmax(has)
    last = n - 1 - jnp.argmax(has[::-1])
    return first, last


def translate_image(key: jax.Array, img: jax.Array) -> jax.Array:
    """Shift by a random in-bounds offset (parity: translate_omniglot,
    priors/omniglot.py:29-34; shifts sampled uniformly within the content
    margins). ``jnp.roll`` is exact here: the shift never exceeds the empty
    margin, so no ink wraps around."""
    H, W = img.shape
    k_r, k_c = jax.random.split(key)
    r0, r1 = _content_margins(img, 0)
    c0, c1 = _content_margins(img, 1)
    dr = jax.random.randint(k_r, (), -r0, H - r1)
    dc = jax.random.randint(k_c, (), -c0, W - c1)
    return jnp.roll(img, (dr, dc), axis=(0, 1))


@dataclasses.dataclass
class OmniglotPrior:
    """N-way k-shot episodes over a :class:`ClassBank`.

    ``seq_len`` passed to :meth:`sample` must satisfy
    ``(seq_len - 1) % num_outputs == 0`` (priors/omniglot.py:45); then
    ``k_shot = (seq_len - 1) // num_outputs``.
    """

    bank: ClassBank
    num_outputs: int = 5  # n_way
    translations: bool = True
    rotation_class_augs: bool = True
    alphabet_grouped: bool = False  # Jonas style

    def __post_init__(self):
        self.images = jnp.asarray(self.bank.images)  # (C, P, H, W)
        self.alphabet_ids = jnp.asarray(self.bank.alphabet_ids)
        C, P, H, W = self.images.shape
        self.num_features = H * W
        assert C >= self.num_outputs

    # ---- episode construction ---------------------------------------------
    def _sample_classes(self, key: jax.Array) -> jax.Array:
        """n_way distinct class indices; with alphabet grouping, all from one
        random alphabet (OmniglotNShotJonas.next, omniglotNshot.py:38-48)."""
        C = self.images.shape[0]
        n_way = self.num_outputs
        if not self.alphabet_grouped:
            return jax.random.permutation(key, C)[:n_way]
        k_a, k_c = jax.random.split(key)
        num_alphabets = int(np.max(self.bank.alphabet_ids)) + 1
        alphabet = jax.random.randint(k_a, (), 0, num_alphabets)
        member = self.alphabet_ids == alphabet
        # Rank classes by (not-member, random) and take the first n_way: a
        # static-shape "choose within alphabet"; alphabets have >= n_way
        # classes in Omniglot (at least 14 characters each).
        scores = jnp.where(member, 0.0, 1.0) + jax.random.uniform(k_c, (C,)) * 0.5
        return jnp.argsort(scores)[:n_way]

    def _sample_episode(self, key: jax.Array, seq_len: int):
        C, P, H, W = self.images.shape
        n_way = self.num_outputs
        k_shot = (seq_len - 1) // n_way
        ks = jax.random.split(key, 6)

        cls = self._sample_classes(ks[0])  # (n_way,)
        episode_imgs = self.images[cls]  # (n_way, P, H, W)

        if self.rotation_class_augs:
            # One random 90° rotation per class (omniglotNshot.py:196-199).
            rots = jnp.stack(
                [jnp.rot90(episode_imgs, r, axes=(-2, -1)) for r in range(4)]
            )  # (4, n_way, P, H, W)
            k_idx = jax.random.randint(ks[1], (n_way,), 0, 4)
            episode_imgs = rots[k_idx, jnp.arange(n_way)]

        # k_shot + 1 distinct instances per class; the +1th is the query
        # candidate (omniglotNshot.py:191-201).
        inst = jax.vmap(lambda k: jax.random.permutation(k, P)[: k_shot + 1])(
            jax.random.split(ks[2], n_way)
        )  # (n_way, k_shot+1)
        picked = jnp.take_along_axis(
            episode_imgs, inst[:, :, None, None], axis=1
        )  # (n_way, k_shot+1, H, W)

        support = picked[:, :k_shot].reshape(n_way * k_shot, H, W)
        support_y = jnp.repeat(jnp.arange(n_way), k_shot)
        perm = jax.random.permutation(ks[3], n_way * k_shot)
        support, support_y = support[perm], support_y[perm]

        q_cls = jax.random.randint(ks[4], (), 0, n_way)
        query = picked[q_cls, k_shot]

        x = jnp.concatenate([support, query[None]], axis=0)  # (T, H, W)
        y = jnp.concatenate([support_y, q_cls[None]])

        if self.translations:
            x = jax.vmap(translate_image)(
                jax.random.split(ks[5], seq_len), x
            )

        target = jnp.full((seq_len,), -100, jnp.int32).at[-1].set(q_cls)
        return x.reshape(seq_len, H * W), y.astype(jnp.float32), target.astype(
            jnp.float32
        )

    # ---- Prior protocol ----------------------------------------------------
    def sample(self, key: jax.Array, batch_size: int, seq_len: int):
        assert (seq_len - 1) % self.num_outputs == 0, (
            "seq_len - 1 must be divisible by n_way"
        )  # parity: priors/omniglot.py:45
        x, y, t = jax.vmap(lambda k: self._sample_episode(k, seq_len))(
            jax.random.split(key, batch_size)
        )
        return x, y, t


def omniglot_accuracy(
    model,
    params,
    prior: OmniglotPrior,
    batch_size: int = 32,
    seq_len: int = 26,
    num_batches: int = 4,
    seed: int = 0,
) -> float:
    """Last-position episode accuracy — the reference's validate hook
    (priors/omniglot.py:74-98). Call with a prior built on the *test* split
    of the bank and ``translations=False`` semantics handled by the caller.
    """
    key = jax.random.PRNGKey(seed)
    hits = total = 0
    eval_pos = seq_len - 1

    @jax.jit
    def batch_acc(k):
        x, y, _ = prior.sample(k, batch_size, seq_len)
        logits = model.apply(params, x, y, eval_pos)
        pred = jnp.argmax(logits[:, -1, : prior.num_outputs], axis=-1)
        return jnp.sum(pred == y[:, -1].astype(jnp.int32))

    for _ in range(num_batches):
        key, sub = jax.random.split(key)
        hits += int(batch_acc(sub))
        total += batch_size
    return hits / total
