"""Training-transform parity against the ACTUAL reference dataset/processor.py
(VERDICT r4 item 6): spec_aug / spec_sub / spec_trim and the sort-desc collate
run through the reference torch code (via tests/reference_oracle.py) and our
numpy twins on identical inputs and identical random draws.

The reference draws from Python's ``random`` module; our transforms take an
injected numpy-Generator-like rng. A shim replays the exact same Python
``random`` stream through our call pattern (both sides make the same
(lo, hi) requests in the same order), so outputs must match exactly."""

import random
import sys
import types

import numpy as np
import pytest
import torch

from chunkformer_tpu.data import processor as our
from tests.reference_oracle import load_reference


class PyRandomShim:
    """numpy-Generator-compatible ``integers`` backed by Python's random.

    our transforms call rng.integers(lo, hi) (hi exclusive); the reference
    calls random.randint(lo, hi-1) (hi inclusive) at the same points."""

    def integers(self, lo, hi):
        return random.randint(int(lo), int(hi) - 1)


def _load_ref_processor():
    load_reference()
    if "librosa" not in sys.modules:  # imported at module scope, unused here
        sys.modules["librosa"] = types.ModuleType("librosa")
    import chunkformer.dataset.processor as ref_processor

    return ref_processor


@pytest.fixture(scope="module")
def ref_processor():
    return _load_ref_processor()


def _sample(t=200, f=80, seed=0):
    x = np.random.default_rng(seed).normal(size=(t, f)).astype(np.float32)
    return x


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spec_aug_matches_reference(ref_processor, seed):
    x = _sample(seed=seed)
    random.seed(seed)
    ref = ref_processor.spec_aug({"feat": torch.from_numpy(x.copy())},
                                 num_t_mask=2, num_f_mask=2, max_t=50,
                                 max_f=10)["feat"].numpy()
    random.seed(seed)
    got = our.spec_aug({"feat": x.copy()}, num_t_mask=2, num_f_mask=2,
                       max_t=50, max_f=10, rng=PyRandomShim())["feat"]
    np.testing.assert_array_equal(got, ref)
    assert (ref == 0).any(), "masking should have zeroed something"


@pytest.mark.parametrize("seed", [0, 3])
def test_spec_sub_matches_reference(ref_processor, seed):
    x = _sample(seed=seed)
    random.seed(seed)
    ref = ref_processor.spec_sub({"feat": torch.from_numpy(x.copy())},
                                 max_t=20, num_t_sub=3)["feat"].numpy()
    random.seed(seed)
    got = our.spec_sub({"feat": x.copy()}, max_t=20, num_t_sub=3,
                       rng=PyRandomShim())["feat"]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("seed", [0, 5])
def test_spec_trim_matches_reference(ref_processor, seed):
    x = _sample(seed=seed)
    random.seed(seed)
    ref = ref_processor.spec_trim({"feat": torch.from_numpy(x.copy())},
                                  max_t=20)["feat"].numpy()
    random.seed(seed)
    got = our.spec_trim({"feat": x.copy()}, max_t=20,
                        rng=PyRandomShim())["feat"]
    np.testing.assert_array_equal(got, ref)


def test_collate_matches_reference_order_and_values(ref_processor):
    """padding() collate: sort-desc by length, right-pad feats with 0 and
    labels with IGNORE_ID (-1) — reference processor.py:509-576. Our collate
    additionally bucket-pads shapes for the jitted step; with bucket=1 the
    payloads must agree exactly."""
    rng = np.random.default_rng(7)
    samples = []
    for i, t in enumerate([37, 80, 55]):
        samples.append({
            "key": f"u{i}",
            "feat": rng.normal(size=(t, 80)).astype(np.float32),
            "label": list(rng.integers(1, 9, size=3 + i)),
            "wav": np.zeros((1, 16000), np.float32),
        })

    ref_samples = [{**s, "feat": torch.from_numpy(s["feat"]),
                    "label": list(s["label"]),
                    "wav": torch.from_numpy(s["wav"])} for s in samples]
    ref = ref_processor.padding(ref_samples)

    got = our.padding([dict(s) for s in samples], time_bucket=1,
                      label_bucket=1)

    assert list(ref["keys"]) == list(got["keys"])
    np.testing.assert_array_equal(ref["feats_lengths"].numpy(),
                                  got["feats_lengths"])
    np.testing.assert_array_equal(ref["target_lengths"].numpy(),
                                  got["target_lengths"])
    rf, gf = ref["feats"].numpy(), got["feats"]
    assert rf.shape == gf.shape, (rf.shape, gf.shape)
    np.testing.assert_allclose(rf, gf, atol=0)
    np.testing.assert_array_equal(ref["target"].numpy(), got["target"])
