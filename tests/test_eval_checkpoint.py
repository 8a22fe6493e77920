"""--checkpoint eval through the CLI: single-device vs mesh parity.

VERDICT r3 gap #3: the eval-only entry (reference run.py:17-87) must be
able to use the row-sharded mesh scorer — citation2-scale evaluation of
an imported checkpoint cannot be limited to one chip. Train a tiny
synthetic model, save, then eval the checkpoint with and without
``--mesh`` and require identical metrics.
"""
import numpy as np

from lpformer_tpu.cli.run import main


def _base_args(tmp_path):
    return [
        "--data_name", "synthetic", "--platform", "cpu",
        "--syn-nodes", "120", "--syn-edges", "400",
        "--dim", "16", "--batch-size", "128", "--test-batch-size", "64",
        "--eval_steps", "1", "--epochs", "1",
        "--checkpoint-dir", str(tmp_path / "ckpts"),
        "--adj-cap", "24", "--ppr-cap", "48",
        "--budget-cn", "16", "--budget-onehop", "32",
        "--budget-non1hop", "32",
    ]


def test_checkpoint_eval_mesh_matches_single(tmp_path):
    base = _base_args(tmp_path)
    main(base + ["--save-as", "m"])

    single = main(base + ["--checkpoint", "m"])
    meshed = main(base + ["--checkpoint", "m", "--mesh", "2,2"])
    cp = main(base + ["--checkpoint", "m", "--mesh", "2,2",
                      "--context-parallel"])
    np.testing.assert_allclose(meshed, single, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(cp, single, rtol=2e-4, atol=2e-5)
