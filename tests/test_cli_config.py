"""--config JSON loading: named configs resolve, CLI flags override."""
import json

import pytest

from lpformer_tpu.cli.run import apply_config, build_parser


def test_named_config_resolves():
    a = apply_config(build_parser(), ["--config", "ogbl-collab-existing"])
    assert a.batch_size == 24000 and a.use_val_in_test and a.eps == 5e-5
    assert a.data_name == "ogbl-collab"


def test_cli_flag_overrides_config():
    a = apply_config(
        build_parser(),
        ["--config", "ogbl-collab-existing", "--batch-size", "512"],
    )
    assert a.batch_size == 512
    assert a.eps == 5e-5  # untouched config value still applies


def test_config_path_and_unknown_key(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"dim": 48}))
    a = apply_config(build_parser(), ["--config", str(p)])
    assert a.dim == 48

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"not_a_flag": 1}))
    with pytest.raises(ValueError, match="unknown config keys"):
        apply_config(build_parser(), ["--config", str(bad)])


def test_missing_config_raises():
    with pytest.raises(FileNotFoundError):
        apply_config(build_parser(), ["--config", "no-such-config"])


def test_every_shipped_config_parses():
    import glob
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = [
        os.path.splitext(os.path.basename(f))[0]
        for f in glob.glob(os.path.join(root, "configs", "*.json"))
    ]
    assert len(names) >= 13
    for n in names:
        a = apply_config(build_parser(), ["--config", n])
        assert a.data_name in n
