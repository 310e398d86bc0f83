"""Convergence smoke: tiny dusty_v2 trained on synthetic structured range images
must move its generated distribution toward the data (Frechet feature distance).

Cheapest insurance against loss-sign/scale bugs single-step tests can't see
(VERDICT r1 item 7). ~10 min on the 1-core CPU box -> gated behind RUN_SLOW=1;
`scripts/convergence_smoke.py` runs the full 500-step version on TPU and commits
its loss-curve artifact to artifacts/convergence.csv.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="slow (~10 min on 1 CPU core); set RUN_SLOW=1")
def test_generated_distribution_moves_toward_data(tmp_path):
    from scripts.convergence_smoke import run

    fd_init, fd_final = run(
        steps=60, out_csv=str(tmp_path / "curve.csv"), n_eval=64
    )
    assert fd_final < 0.5 * fd_init, (fd_init, fd_final)
