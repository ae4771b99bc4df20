"""Omniglot few-shot prior (parity: reference priors/omniglot.py +
datasets/omniglotNshot.py), exercised on the hermetic synthetic class bank."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfn_tpu.data.omniglot import ClassBank, synthetic_class_bank
from pfn_tpu.priors.omniglot import (
    OmniglotPrior,
    omniglot_accuracy,
    translate_image,
)


@pytest.fixture(scope="module")
def bank():
    return synthetic_class_bank(seed=0, num_classes=20, per_class=6, imgsz=12)


def test_synthetic_bank_shapes(bank):
    assert bank.images.shape == (20, 6, 12, 12)
    assert bank.images.dtype == np.float32
    assert 0.0 <= bank.images.min() and bank.images.max() <= 1.01
    assert bank.alphabet_ids.shape == (20,)


def test_episode_shapes_and_targets(bank):
    prior = OmniglotPrior(bank, num_outputs=5)
    # seq_len = 5-way 3-shot + 1 query = 16.
    x, y, t = jax.jit(lambda k: prior.sample(k, 4, 16))(jax.random.PRNGKey(0))
    assert x.shape == (4, 16, 144)
    assert y.shape == (4, 16) and t.shape == (4, 16)
    # Targets: -100 except last (priors/omniglot.py:60-70).
    assert jnp.all(t[:, :-1] == -100)
    assert jnp.all(t[:, -1] == y[:, -1])
    # Support is balanced: 3 instances of each of 5 classes.
    support = y[:, :-1].astype(jnp.int32)
    for b in range(4):
        counts = jnp.bincount(support[b], length=5)
        assert jnp.all(counts == 3), counts


def test_query_class_is_among_support(bank):
    prior = OmniglotPrior(bank, num_outputs=4)
    _, y, _ = prior.sample(jax.random.PRNGKey(1), 8, 9)
    assert jnp.all((y[:, -1] >= 0) & (y[:, -1] < 4))


def test_seq_len_divisibility(bank):
    prior = OmniglotPrior(bank, num_outputs=5)
    with pytest.raises(AssertionError):
        prior.sample(jax.random.PRNGKey(0), 2, 12)  # (12-1) % 5 != 0


def test_translate_keeps_ink_mass():
    """In-bounds roll never destroys ink (parity: translate w/ fill=0 can't
    clip content because shifts are bounded by the margins)."""
    img = jnp.zeros((9, 9)).at[3:6, 4:7].set(1.0)
    for s in range(5):
        out = translate_image(jax.random.PRNGKey(s), img)
        assert float(out.sum()) == float(img.sum())


def test_translations_off_is_deterministic_bank_content(bank):
    prior = OmniglotPrior(bank, num_outputs=3, translations=False,
                          rotation_class_augs=False)
    x, y, _ = prior.sample(jax.random.PRNGKey(2), 2, 7)
    # Every sequence image must literally be an instance from the bank.
    flat_bank = bank.images.reshape(-1, 144)
    for b in range(2):
        for pos in range(7):
            img = np.asarray(x[b, pos])
            dists = np.abs(flat_bank - img[None]).max(axis=1)
            assert dists.min() < 1e-6


def test_alphabet_grouped_episodes(bank):
    """Jonas style: all episode classes share one alphabet
    (omniglotNshot.py:38-48)."""
    prior = OmniglotPrior(bank, num_outputs=3, alphabet_grouped=True,
                          translations=False, rotation_class_augs=False)
    aid = np.asarray(bank.alphabet_ids)
    flat_bank = bank.images.reshape(20, 6, -1)
    x, y, _ = prior.sample(jax.random.PRNGKey(3), 4, 7)
    for b in range(4):
        classes = set()
        for pos in range(7):
            img = np.asarray(x[b, pos])
            d = np.abs(flat_bank - img[None, None]).max(axis=-1).min(axis=-1)
            classes.add(int(d.argmin()))
        assert len({int(aid[c]) for c in classes}) == 1


def test_validate_hook_untrained_is_chance(bank):
    """Untrained model ≈ chance accuracy; the hook runs end to end
    (priors/omniglot.py:74-98)."""
    from pfn_tpu.train import ce_criterion, TrainConfig
    from pfn_tpu.train.loop import build_model

    prior = OmniglotPrior(bank, num_outputs=4)
    crit = ce_criterion(4)
    cfg = TrainConfig(emsize=16, nhid=32, nlayers=1, nhead=2, bptt=9)
    model = build_model(prior, crit, cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=9)
    acc = omniglot_accuracy(model, params, prior, batch_size=16, seq_len=9,
                            num_batches=2)
    assert 0.0 <= acc <= 0.7  # chance is 0.25


def test_load_omniglot_class_bank_from_disk(tmp_path):
    """The real-data file-parsing path (reference datasets/omniglot.py:83-112
    layout: omniglot-py/images_{background,evaluation}/<alphabet>/<char>/*.png)
    on a miniature generated directory tree."""
    from PIL import Image

    from pfn_tpu.data.omniglot import load_omniglot_class_bank

    rng = np.random.RandomState(0)
    layout = {
        "images_background": ["AlphaA", "AlphaB"],
        "images_evaluation": ["AlphaC"],
    }
    per_class, n_char = 3, 2
    for split, alphabets in layout.items():
        for alphabet in alphabets:
            for ci in range(n_char):
                cdir = tmp_path / "omniglot-py" / split / alphabet / f"character{ci:02d}"
                cdir.mkdir(parents=True)
                for k in range(per_class):
                    # Omniglot-style: white background (255), black ink (0).
                    arr = np.full((105, 105), 255, np.uint8)
                    arr[20 + 10 * ci : 40 + 10 * ci, 30 : 60 + 5 * k] = 0
                    Image.fromarray(arr, mode="L").save(cdir / f"{k}.png")

    bank = load_omniglot_class_bank(str(tmp_path), imgsz=28)
    assert bank.images.shape == (6, per_class, 28, 28)  # 3 alphabets x 2 chars
    assert bank.images.dtype == np.float32
    assert 0.0 <= bank.images.min() and bank.images.max() <= 1.0
    # Inverted to MNIST style: ink is bright, background dark.
    assert bank.images.mean() < 0.5 < bank.images.max()
    # Alphabet ids follow directory grouping across both splits.
    np.testing.assert_array_equal(bank.alphabet_ids, [0, 0, 1, 1, 2, 2])

    # The loaded bank drives the episode prior end to end.
    prior = OmniglotPrior(bank, num_outputs=3, rotation_class_augs=False)
    seq_len = 1 + 3 * 1  # 3-way 1-shot + 1 query
    x, y, target_y = prior.sample(jax.random.PRNGKey(0), 4, seq_len)
    assert np.isfinite(np.asarray(x)).all()
    # Only-last-idx targets (priors/omniglot.py parity).
    assert (np.asarray(target_y)[:, :-1] == -100).all()


def test_load_omniglot_class_bank_missing_dir_raises(tmp_path):
    from pfn_tpu.data.omniglot import load_omniglot_class_bank

    with pytest.raises(FileNotFoundError, match="Omniglot data not found"):
        load_omniglot_class_bank(str(tmp_path / "nope"))
