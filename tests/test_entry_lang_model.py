"""The entry's embedded language model must equal a fresh deterministic
refit on its literal pools — the guarantee that lets the multimodal
slot's language rider embed the model as a constant (and lets
oracle_sql() stay session-free) without the literal drifting from the
trainer's behavior.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from anomalyzer_spark.functions import langid


@pytest.mark.slow
def test_embedded_model_equals_refit(spark):
    labeled = {
        lg: spark.createDataFrame([(s,) for s in pool], "text string")
        for lg, pool in entry._LANG_POOLS.items()
    }
    refit = langid.train_lang_model(labeled, sample_rows=64, iters=100)
    # the trainer's softmax step runs through BLAS (``xs @ w.T``), whose
    # reduction order varies across BLAS builds/hosts — observed (r15): a
    # refit on a different sandbox image reproduces the literal only to
    # the last ULP (~1e-16 relative). The guarantee this test pins is
    # "the literal does not DRIFT from the trainer's behavior", not
    # cross-BLAS bit-equality — so float fields compare at 1e-9 (any
    # real spec/pool/hyperparameter drift is orders of magnitude above
    # that; tests below pin the spec exactly), non-float fields exactly.
    import numpy as np

    assert sorted(refit) == sorted(entry._LANG_MODEL)
    for key, want in entry._LANG_MODEL.items():
        got = refit[key]
        if key in ("weights", "bias", "mean", "std"):
            assert np.allclose(got, want, rtol=1e-9, atol=1e-12), key
        else:
            assert got == want, key


def test_embedded_model_spec_is_current():
    # refuses to score if langid's feature spec moved without refitting
    langid._check_spec(entry._LANG_MODEL)
    assert entry._LANG_MODEL["langs"] == sorted(entry._LANG_POOLS)
    with pytest.raises(ValueError):
        langid._check_spec({**entry._LANG_MODEL, "scripts": ["latin"]})
