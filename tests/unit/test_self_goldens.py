"""Self-golden regression pins: fixed-seed toy models vs committed outputs.

``tests/data/self_goldens.npz`` (regenerate: scripts/gen_self_goldens.py)
holds fp32 CPU outputs for every model family. These catch silent numeric
drift — a JAX/XLA upgrade or a refactor that subtly changes math — across
rounds, independent of the egress-gated real-checkpoint goldens. A failure
here means the framework's numerics CHANGED: if intentional, regenerate
the fixture and say why in the commit.
"""

from pathlib import Path
import sys

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent.parent / "scripts"))

GOLDENS = Path(__file__).parent.parent / "data" / "self_goldens.npz"

# fp32 CPU is deterministic per environment; tolerance absorbs cross-version
# XLA fusion/reassociation differences for O(1)-magnitude outputs.
ATOL = 1e-4


@pytest.fixture(scope="module")
def fresh_and_golden():
    from gen_self_goldens import build_all

    return build_all(), dict(np.load(GOLDENS))


def test_golden_keys_match(fresh_and_golden):
    fresh, golden = fresh_and_golden
    assert set(fresh) == set(golden)


@pytest.mark.parametrize(
    "key",
    [
        "text_emb", "speech_fbank_rowsum", "speech_emb", "laser2_emb",
        "blaser_comet", "blaser_qe", "mutox_logits", "mutox_probs",
        "beam_scores",
    ],
)
def test_numeric_outputs_match(fresh_and_golden, key):
    fresh, golden = fresh_and_golden
    np.testing.assert_allclose(
        fresh[key], golden[key], atol=ATOL, rtol=1e-4,
        err_msg=f"self-golden drift in {key!r} — numerics changed; if "
        f"intentional, regenerate via scripts/gen_self_goldens.py",
    )


@pytest.mark.parametrize("key", ["beam_tokens", "beam_lens"])
def test_beam_discrete_outputs_exact(fresh_and_golden, key):
    fresh, golden = fresh_and_golden
    np.testing.assert_array_equal(fresh[key], golden[key])


def test_inputs_unchanged(fresh_and_golden):
    """The generator's inputs must stay bit-identical to the committed ones
    (otherwise output comparisons are meaningless)."""
    fresh, golden = fresh_and_golden
    for key in ("text_seqs", "text_lens", "beam_memory", "laser2_seqs",
                "laser2_lens", "blaser_src", "blaser_mt", "blaser_ref"):
        np.testing.assert_array_equal(fresh[key], golden[key])
