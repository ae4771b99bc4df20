"""Omniglot class banks: real data (gated) and a hermetic synthetic stand-in.

Parity: reference datasets/omniglot.py (download/unzip + alphabet-indexed
access) and the preprocessing in datasets/omniglotNshot.py:97-105 /
OmniglotNShotJonas:22-29 — grayscale, resize to imgsz, scale to [0,1], invert
to MNIST style (1 - x). The reference organizes data as a
``(num_classes, 20, H, W)`` bank split into train (first 1200 classes) and
test (classes 1200+) (omniglotNshot.py:136); the Jonas variant groups classes
by alphabet (30 train / 20 test alphabets, omniglotNshot.py:38).

TPU-native design: the bank is ONE dense float32 array shipped to device
once; episode construction is a pure function of a PRNG key
(:mod:`pfn_tpu.priors.omniglot`). Real-data loading requires the torchvision
Omniglot files on local disk (this environment has no network egress —
``download=True`` is never attempted); tests and demos use
:func:`synthetic_class_bank`, which renders stroke-program alphabets with the
same renderer as the stroke prior.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class ClassBank:
    """images: (num_classes, per_class, H, W) float32 in [0, 1] (MNIST-style,
    ink=1); alphabet_ids: (num_classes,) int — which alphabet each class
    belongs to (for Jonas-style alphabet-grouped episodes)."""

    images: np.ndarray
    alphabet_ids: np.ndarray

    @property
    def num_classes(self) -> int:
        return self.images.shape[0]

    def split(self, num_train_classes: int = 1200, test_start: int | None = None):
        """Train/test split by class index (omniglotNshot.py:136: train =
        first ``num_train_classes`` classes, test = classes 1200+ on the
        full 1623-class bank). ``test_start`` defaults to the reference's
        1200 when the bank is big enough, else to ``num_train_classes`` so
        smaller (synthetic) banks still get a disjoint, non-empty test
        split."""
        if test_start is None:
            test_start = 1200 if self.num_classes > 1200 else num_train_classes
        assert test_start >= num_train_classes, (
            f"test classes [{test_start}:] would overlap train "
            f"[:{num_train_classes}]"
        )
        assert test_start < self.num_classes, "empty test split"
        train = ClassBank(
            self.images[:num_train_classes], self.alphabet_ids[:num_train_classes]
        )
        test = ClassBank(self.images[test_start:], self.alphabet_ids[test_start:])
        return train, test


def load_omniglot_class_bank(root: str = "omniglot", imgsz: int = 28) -> ClassBank:
    """Load the real Omniglot data into a ClassBank.

    Requires torchvision's Omniglot files already on disk under ``root``
    (``omniglot-py/images_background`` and ``images_evaluation``); never
    downloads. 1623 character classes × 20 drawings, processed like the
    reference (resize, /255, invert — omniglotNshot.py:97-105).
    """
    from PIL import Image

    base = os.path.join(root, "omniglot-py")
    splits = ["images_background", "images_evaluation"]
    for s in splits:
        if not os.path.isdir(os.path.join(base, s)):
            raise FileNotFoundError(
                f"Omniglot data not found under {base!r}. This environment "
                "has no network access; place the torchvision omniglot-py "
                "directory there, or use synthetic_class_bank() for a "
                "hermetic stand-in."
            )
    classes, alphabet_ids = [], []
    alphabet_index = 0
    for s in splits:
        split_dir = os.path.join(base, s)
        for alphabet in sorted(os.listdir(split_dir)):
            adir = os.path.join(split_dir, alphabet)
            if not os.path.isdir(adir):
                continue
            for character in sorted(os.listdir(adir)):
                cdir = os.path.join(adir, character)
                imgs = []
                for fname in sorted(os.listdir(cdir))[:20]:
                    with Image.open(os.path.join(cdir, fname)) as im:
                        im = im.convert("L").resize((imgsz, imgsz))
                        arr = np.asarray(im, dtype=np.float32) / 255.0
                    imgs.append(1.0 - arr)  # invert to MNIST style
                classes.append(np.stack(imgs))
                alphabet_ids.append(alphabet_index)
            alphabet_index += 1
    return ClassBank(
        images=np.stack(classes).astype(np.float32),
        alphabet_ids=np.asarray(alphabet_ids, dtype=np.int32),
    )


def synthetic_class_bank(
    seed: int = 0,
    num_classes: int = 40,
    per_class: int = 20,
    imgsz: int = 28,
    classes_per_alphabet: int = 10,
) -> ClassBank:
    """A hermetic Omniglot stand-in: each class is a stroke program (as in
    the stroke prior), each instance a jittered render of it."""
    import jax
    import jax.numpy as jnp

    from pfn_tpu.priors.stroke import StrokePrior

    sp = StrokePrior(num_features=imgsz * imgsz, num_outputs=1)
    key = jax.random.PRNGKey(seed)
    k_prog, k_render = jax.random.split(key)
    progs = sp._sample_class_programs(k_prog, (num_classes,))
    rkeys = jax.random.split(k_render, num_classes * per_class).reshape(
        num_classes, per_class, -1
    )

    def render_class(prog, ks):
        return jax.vmap(
            lambda k: sp._render(
                k, prog["start"][0], prog["length"][0], prog["angle"][0],
                prog["active"][0],
            )
        )(ks)

    imgs = jax.jit(jax.vmap(render_class))(progs, rkeys)
    imgs = np.asarray(imgs).reshape(num_classes, per_class, imgsz, imgsz)
    alphabet_ids = np.arange(num_classes) // classes_per_alphabet
    return ClassBank(imgs.astype(np.float32), alphabet_ids.astype(np.int32))
