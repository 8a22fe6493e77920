"""End-to-end training: loss decreases, eval runs, checkpoints resume."""
import numpy as np

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.models import LPFormerConfig
from lpformer_tpu.train.trainer import TrainArgs, train_data, train_loop
from lpformer_tpu.utils.logger import ResultsLogger


def _cfg():
    return LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=16, budget_onehop=32,
        budget_non1hop=32, dropout=0.0, gnn_drop=0.0, att_drop=0.0,
    )


def test_loss_decreases_and_eval():
    ds = synthetic_dataset(
        seed=1, num_nodes=120, num_train=400, num_eval=40, feat_dim=8
    )
    args = TrainArgs(
        epochs=4, lr=5e-3, batch_size=128, test_batch_size=256,
        eval_steps=4, runs=1, metric="MRR", verbose=False,
        data_name="synthetic",
    )
    best, valid_s, test_s = train_data(args, _cfg(), ds)
    assert best > 0
    assert "±" in valid_s and "±" in test_s


def test_heart_mode_end_to_end():
    ds = synthetic_dataset(
        seed=2, num_nodes=100, num_train=300, num_eval=24, feat_dim=8,
        heart=True, heart_negs=6,
    )
    args = TrainArgs(
        epochs=2, lr=5e-3, batch_size=128, test_batch_size=128,
        eval_steps=2, runs=1, metric="MRR", verbose=False,
        data_name="synthetic-heart",
    )
    best, _, _ = train_data(args, _cfg(), ds)
    assert best > 0


def test_checkpoint_resume(tmp_path):
    from lpformer_tpu.utils import checkpoint as ckpt

    ds = synthetic_dataset(
        seed=3, num_nodes=100, num_train=300, num_eval=24, feat_dim=8
    )
    args = TrainArgs(
        epochs=2, lr=5e-3, batch_size=128, test_batch_size=128,
        eval_steps=2, runs=1, metric="MRR", verbose=False,
        save_as="m", checkpoint_dir=str(tmp_path), data_name="synth",
    )
    loggers = {
        "Hits@20": ResultsLogger(1), "Hits@50": ResultsLogger(1),
        "Hits@100": ResultsLogger(1), "MRR": ResultsLogger(1),
    }
    import os
    train_loop(args, _cfg(), ds, loggers, 0, os.path.join(str(tmp_path), "synth", "m"))
    state = ckpt.load_checkpoint(os.path.join(str(tmp_path), "synth", "m.ckpt"))
    assert state is not None
    assert "params" in state and "opt_state" in state
    assert int(state["epoch"]) >= 2

    # the checkpointed params evaluate identically when reloaded
    from lpformer_tpu.evalx import harness
    r1 = harness.test_standard(
        state["params"], _cfg(), ds, batch_size=128, with_mrr=True
    )
    r2 = harness.test_standard(
        state["params"], _cfg(), ds, batch_size=128, with_mrr=True
    )
    assert r1["MRR"] == r2["MRR"]


def test_save_every_periodic_checkpoint(tmp_path):
    """--save-every writes a .latest.ckpt usable for crash recovery
    independently of best-valid progress."""
    import os

    from lpformer_tpu.utils import checkpoint as ckpt

    ds = synthetic_dataset(
        seed=3, num_nodes=100, num_train=300, num_eval=24, feat_dim=8
    )
    args = TrainArgs(
        epochs=3, lr=5e-3, batch_size=128, test_batch_size=128,
        eval_steps=10,  # never evals -> never saves best-valid
        runs=1, metric="MRR", verbose=False, save_every=2,
        save_as="m", checkpoint_dir=str(tmp_path), data_name="synth",
    )
    loggers = {
        "Hits@20": ResultsLogger(1), "Hits@50": ResultsLogger(1),
        "Hits@100": ResultsLogger(1), "MRR": ResultsLogger(1),
    }
    base = os.path.join(str(tmp_path), "synth", "m")
    train_loop(args, _cfg(), ds, loggers, 0, base)
    assert not os.path.exists(base + ".ckpt")  # no eval -> no best save
    state = ckpt.load_checkpoint(base + ".latest.ckpt")
    assert state is not None and int(state["epoch"]) == 2


def test_mask_input_training():
    ds = synthetic_dataset(
        seed=4, num_nodes=100, num_train=300, num_eval=24, feat_dim=8
    )
    args = TrainArgs(
        epochs=2, lr=5e-3, batch_size=128, test_batch_size=128,
        eval_steps=2, runs=1, metric="MRR", verbose=False,
        mask_input=True, data_name="synth",
    )
    best, _, _ = train_data(args, _cfg(), ds)
    assert best > 0


def test_shared_propagation_exact_when_no_gnn_dropout():
    """double_propagate=None resolves to the shared-propagation fast path
    when mask_input is off; with gnn_drop == feat_drop == 0 it is
    bit-identical to the reference's two-propagation step."""
    import jax
    import jax.numpy as jnp

    from lpformer_tpu.models import init_lpformer
    from lpformer_tpu.train import make_optimizer
    from lpformer_tpu.train.step import TrainState, make_train_step

    ds = synthetic_dataset(
        seed=5, num_nodes=120, num_train=400, num_eval=40, feat_dim=8
    )
    cfg = _cfg()
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=8)
    opt = make_optimizer(1e-3, steps_per_epoch=10)
    src = jnp.asarray(np.asarray(ds.train_pos)[:64, 0])
    tgt = jnp.asarray(np.asarray(ds.train_pos)[:64, 1])
    w = jnp.ones((64,), jnp.float32)
    bin_w = (ds.graph.edge_w > 0).astype(jnp.float32)
    rng = jax.random.PRNGKey(3)

    losses = {}
    for name, dp in (("auto", None), ("double", True), ("single", False)):
        step = make_train_step(cfg, opt, double_propagate=dp, donate=False)
        state = TrainState(
            jax.tree_util.tree_map(jnp.array, params),
            opt.init(params), jnp.asarray(0, jnp.int32),
        )
        state, loss = step(state, ds.graph, ds.mask_mult_device, bin_w,
                           src, tgt, w, rng)
        losses[name] = (float(loss), state.params)

    assert losses["auto"][0] == losses["single"][0]
    # same math, different XLA programs -> identical up to fp reassociation
    np.testing.assert_allclose(losses["auto"][0], losses["double"][0],
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(losses["auto"][1]),
                    jax.tree_util.tree_leaves(losses["double"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_checkpoint_format_pickle_free_and_target_restore(tmp_path):
    """Version-1 checkpoints are a pickle-free npz zip: loadable with
    allow_pickle=False, generically (nested dicts/lists) or INTO a target
    pytree (rebuilding optax namedtuples), with structure validation."""
    import os
    import zipfile

    import jax
    import jax.numpy as jnp

    from lpformer_tpu.models import init_lpformer
    from lpformer_tpu.train import make_optimizer
    from lpformer_tpu.utils import checkpoint as ckpt

    cfg = _cfg()
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=8)
    opt = make_optimizer(1e-3, steps_per_epoch=10)
    state = {
        "params": params,
        "opt_state": opt.init(params),
        "step": jnp.asarray(7, jnp.int32),
        "epoch": 3,
        "seed": 1,
    }
    path = os.path.join(str(tmp_path), "c.ckpt")
    ckpt.save_checkpoint(path, state)

    assert zipfile.is_zipfile(path)  # npz, not a pickle stream
    with np.load(path, allow_pickle=False) as z:  # no pickled objects
        assert "__manifest__" in z.files

    # generic load: params keep the init_lpformer nesting (lists stay lists)
    blob = ckpt.load_checkpoint(path)
    assert int(blob["epoch"]) == 3 and int(blob["step"]) == 7
    assert isinstance(blob["params"]["att_layers"], list)
    for a, b in zip(jax.tree_util.tree_leaves(blob["params"]),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # target restore: exact treedef of the skeleton, incl. optax state
    skeleton = jax.tree_util.tree_map(np.zeros_like, state)
    restored = ckpt.load_checkpoint(path, target=skeleton)
    assert (jax.tree_util.tree_structure(restored)
            == jax.tree_util.tree_structure(skeleton))
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # structure mismatch is a loud error, not silent corruption
    bad = dict(skeleton)
    del bad["seed"]
    bad["extra"] = np.zeros(())
    import pytest as _pytest
    with _pytest.raises(ValueError, match="does not match"):
        ckpt.load_checkpoint(path, target=bad)


def test_legacy_pickle_checkpoint_requires_optin(tmp_path):
    """Round-2 pickle checkpoints load ONLY behind an explicit
    allow_legacy_pickle=True (unpickling runs arbitrary code, so a
    silent fallback would void the format's untrusted-file safety)."""
    import os
    import pickle

    import jax
    import pytest

    from lpformer_tpu.utils import checkpoint as ckpt

    state = {"params": {"w": np.arange(4.0)}, "epoch": 2}
    leaves, treedef = jax.tree_util.tree_flatten(state)
    path = os.path.join(str(tmp_path), "old.ckpt")
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef,
                     "leaves": [np.asarray(x) for x in leaves]}, f)
    with pytest.raises(ValueError, match="legacy round-2 pickle"):
        ckpt.load_checkpoint(path)
    blob = ckpt.load_checkpoint(path, allow_legacy_pickle=True)
    assert int(blob["epoch"]) == 2
    np.testing.assert_array_equal(blob["params"]["w"], np.arange(4.0))

    # junk that is neither zip nor pickle is a loud error either way
    junk = os.path.join(str(tmp_path), "junk.ckpt")
    with open(junk, "wb") as f:
        f.write(b"not a checkpoint")
    with pytest.raises(ValueError, match="not a"):
        ckpt.load_checkpoint(junk, allow_legacy_pickle=True)


def test_checkpoint_preserves_mldtypes_leaves(tmp_path):
    """npz silently degrades ml_dtypes leaves to raw void arrays; the
    format must round-trip a bfloat16 leaf bit-exactly via the manifest
    dtype record (ADVICE r3)."""
    import os

    import ml_dtypes

    from lpformer_tpu.utils import checkpoint as ckpt

    w = np.arange(-8, 8, dtype=np.float32).astype(ml_dtypes.bfloat16)
    state = {"params": {"w": w, "b": np.float32(2.5)}, "step": 3}
    path = os.path.join(str(tmp_path), "bf16.ckpt")
    ckpt.save_checkpoint(path, state)
    blob = ckpt.load_checkpoint(path)
    assert blob["params"]["w"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        blob["params"]["w"].view(np.uint16), w.view(np.uint16)
    )
    assert blob["params"]["b"].dtype == np.float32


def test_true_resume_from_npz_checkpoint(tmp_path):
    """--resume restores params + optimizer state + epoch from the new
    format and continues training."""
    import os

    ds = synthetic_dataset(
        seed=6, num_nodes=100, num_train=300, num_eval=24, feat_dim=8
    )
    base_args = dict(
        lr=5e-3, batch_size=128, test_batch_size=128, eval_steps=10,
        runs=1, metric="MRR", verbose=False, save_every=1,
        save_as="m", checkpoint_dir=str(tmp_path), data_name="synth",
    )
    loggers = {
        "Hits@20": ResultsLogger(1), "Hits@50": ResultsLogger(1),
        "Hits@100": ResultsLogger(1), "MRR": ResultsLogger(1),
    }
    base = os.path.join(str(tmp_path), "synth", "m")
    train_loop(TrainArgs(epochs=2, **base_args), _cfg(), ds, loggers, 0,
               base)

    from lpformer_tpu.utils import checkpoint as ckpt
    saved = ckpt.load_checkpoint(base + ".latest.ckpt")
    assert int(saved["epoch"]) == 2

    resumed_args = TrainArgs(
        epochs=4, resume=base + ".latest.ckpt", **base_args
    )
    train_loop(resumed_args, _cfg(), ds, loggers, 0, base)
    after = ckpt.load_checkpoint(base + ".latest.ckpt")
    assert int(after["epoch"]) == 4
    assert int(after["step"]) > int(saved["step"])
