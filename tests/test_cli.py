"""CLI integration tests: the real argparse entry points, tiny workloads.

These run the actual ``main()`` functions (train / evaluate / visualize /
infer) on the CPU mesh with reduced sizes — argument parsing, run-dir
creation, checkpointing, logging, and the end-to-end wiring that unit
tests bypass.
"""

import json
import os

import numpy as np
import pytest

REF = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF, "ycb_video_data_tfRecords"))


@pytest.mark.skipif(not HAVE_REF, reason="reference data absent")
def test_train_cli_two_steps(tmp_path):
    from cloudaae_tpu import train

    state = train.main(
        [
            "--data-root", REF,
            "--classes", "0",
            "--batch-size", "8",
            "--num-point", "64",
            "--hpr-iters", "4",
            "--max-steps", "2",
            "--max-epoch", "1",
            "--log-every", "1",
            "--log-dir", str(tmp_path / "log"),
        ]
    )
    assert int(state.step) == 2
    run_dirs = list((tmp_path / "log" / "21" / "6d").iterdir())
    assert len(run_dirs) == 1
    run = run_dirs[0]
    assert (run / "config.json").exists()
    assert (run / "log_train.txt").exists()
    assert (run / "metrics.csv").exists()
    assert (run / "code_snapshot" / "cloudaae_tpu").is_dir()
    # a checkpoint was written and is restorable via --resume
    ckpts = list((run / "ckpt").iterdir())
    assert len(ckpts) == 1
    # the per-epoch survival artifact: params npz next to the run logs
    from cloudaae_tpu import checkpoint

    params, batch_stats, step = checkpoint.load_params(
        str(run / "params_latest.npz")
    )
    assert step == 2
    assert params and batch_stats

    state2 = train.main(
        [
            "--data-root", REF,
            "--classes", "0",
            "--batch-size", "8",
            "--num-point", "64",
            "--hpr-iters", "4",
            "--max-steps", "4",
            "--max-epoch", "1",
            "--log-every", "1",
            "--log-dir", str(tmp_path / "log2"),
            "--resume", str(run / "ckpt"),
        ]
    )
    assert int(state2.step) == 4


@pytest.mark.skipif(not HAVE_REF, reason="reference data absent")
def test_train_cli_linemod_generate_poses(tmp_path):
    """LINEMOD flow: 13 classes, LINEMOD frustum, on-device pose sampling.

    LINEMOD object models aren't shipped with the reference; the YCB model
    tfrecord stands in (--object-models) — the flow only gathers rows < 13.
    """
    from cloudaae_tpu import train

    state = train.main(
        [
            "--dataset", "linemod",
            "--generate-poses",
            "--object-models",
            os.path.join(REF, "object_model_tfrecord/obj_models.tfrecords"),
            "--batch-size", "8",
            "--num-point", "64",
            "--hpr-iters", "4",
            "--max-steps", "2",
            "--max-epoch", "1",
            "--log-every", "1",
            "--log-dir", str(tmp_path / "log"),
        ]
    )
    assert int(state.step) == 2
    run_dirs = list((tmp_path / "log" / "13" / "6d").iterdir())
    assert len(run_dirs) == 1
    cfg = json.loads((run_dirs[0] / "config.json").read_text())
    assert cfg["synth"]["dataset"] == "linemod"
    assert cfg["model"]["num_class"] == 13


@pytest.mark.skipif(not HAVE_REF, reason="reference data absent")
def test_train_cli_linemod_requires_generated_poses():
    from cloudaae_tpu import train

    with pytest.raises(SystemExit, match="generate-poses"):
        train.main(["--dataset", "linemod", "--data-root", REF])


@pytest.mark.skipif(not HAVE_REF, reason="reference data absent")
@pytest.mark.parametrize("extra", [[], ["--per-frame"]])
def test_evaluate_cli_synthetic(capsys, extra):
    from cloudaae_tpu import evaluate

    res = evaluate.main(
        ["--synthetic", "1", "--target-cls", "2", "--data-root", REF, *extra]
    )
    assert res.frames == 1
    out = capsys.readouterr().out
    assert "ADD" in out and "trans_loss" in out


@pytest.mark.skipif(not HAVE_REF, reason="reference data absent")
def test_evaluate_nondefault_variant_no_flags(tmp_path):
    """A non-default architecture run must evaluate with NO extra flags:
    the run dir's archived config.json decides the model, never the CLI
    --model default (VERDICT round 2 #4, evaluate.py footgun)."""
    from cloudaae_tpu import evaluate, train

    train.main(
        [
            "--data-root", REF,
            "--model", "dgcnn_max_6d",
            "--classes", "2",
            "--batch-size", "8",
            "--num-point", "64",
            "--hpr-iters", "4",
            "--max-steps", "1",
            "--max-epoch", "1",
            "--log-every", "1",
            "--log-dir", str(tmp_path / "log"),
        ]
    )
    run = next((tmp_path / "log" / "21" / "6d").iterdir())
    archived = json.loads((run / "config.json").read_text())["model"]
    assert archived["name"] == "dgcnn_max_6d"
    # the preset's architecture fields must be folded into the archive,
    # not just its name — eval rebuilds the model from this file alone
    assert archived["aggregation"] == "max"
    # ckpt dir, run dir, and npz spellings all work without --model
    for target in (str(run / "ckpt"), str(run),
                   str(run / "params_latest.npz")):
        res = evaluate.main(
            [
                "--trained-model", target,
                "--synthetic", "1",
                "--target-cls", "2",
                "--num-point", "64",
                "--data-root", REF,
            ]
        )
        assert res.frames == 1


@pytest.mark.skipif(not HAVE_REF, reason="reference data absent")
def test_visualize_cli(tmp_path):
    pytest.importorskip("matplotlib")
    from cloudaae_tpu import visualize

    out = str(tmp_path / "s.png")
    visualize.main(["--out", out, "--class-id", "3", "--data-root", REF])
    assert os.path.getsize(out) > 5000


@pytest.mark.skipif(not HAVE_REF, reason="reference data absent")
def test_visualize_ply_html_export(tmp_path):
    """Interactive-viz exports: colored PLY (read back via read_ply) and a
    self-contained HTML orbit viewer — the headless-host equivalents of the
    reference's open3d windows (evaluate_cloudAAE_ycbv.py:571-603)."""
    from cloudaae_tpu import visualize
    from cloudaae_tpu.data.linemod import read_ply

    ply = str(tmp_path / "s.ply")
    visualize.main(["--out", ply, "--class-id", "3", "--data-root", REF])
    xyz, rgb = read_ply(ply)
    assert len(xyz) > 2048  # model + occluder + input + target
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0

    html = str(tmp_path / "s.html")
    visualize.main(["--out", html, "--class-id", "3", "--data-root", REF])
    body = open(html).read()
    assert "drag to orbit" in body and '"pts"' in body
    assert "http" not in body  # self-contained: no external fetches


def test_linemod_cli_help():
    from cloudaae_tpu.data import linemod

    with pytest.raises(SystemExit):
        linemod.main(["--help"])


@pytest.mark.skipif(not HAVE_REF, reason="reference data absent")
def test_train_cli_real_records(tmp_path):
    """--real-records finetune path: CLI wiring end to end."""
    import jax
    import jax.numpy as jnp

    from cloudaae_tpu import so3, train
    from cloudaae_tpu.data import load_object_models, tfrecord
    from cloudaae_tpu.data.ycb_real import fps_record_bytes

    obj = load_object_models(
        os.path.join(REF, "object_model_tfrecord/obj_models.tfrecords")
    )
    rng = np.random.default_rng(0)
    payloads = []
    for i in range(16):
        cls = int(rng.integers(0, 21))
        axag = rng.normal(size=3).astype(np.float32) * 0.8
        R = np.asarray(so3.exp_map(jnp.asarray(axag)))
        t = np.array([0.0, 0.0, 0.7], np.float32)
        xyz = (obj[cls, :1024, :3] @ R.T + t).astype(np.float32)
        payloads.append(fps_record_bytes({
            "xyz": xyz, "rgb": np.zeros((1024, 3), np.float32),
            "translation": t,
            "quaternion": np.asarray(so3.axag_to_quat(jnp.asarray(axag))),
            "num_valid_points_in_segment": 1024, "class_id": cls,
        }))
    rec_path = str(tmp_path / "real.tfrecords")
    tfrecord.write_tfrecord(rec_path, payloads)

    state = train.main([
        "--data-root", REF,
        "--real-records", rec_path,
        "--freeze-encoder",
        "--batch-size", "8",
        "--num-point", "64",
        "--hpr-iters", "4",
        "--max-steps", "2",
        "--max-epoch", "1",
        "--log-every", "1",
        "--log-dir", str(tmp_path / "log"),
    ])
    assert int(state.step) == 2


def test_config_from_dict_roundtrip():
    """config.json (dataclasses.asdict) -> config_from_dict is the identity,
    ignores unknown keys, and restores tuples."""
    import dataclasses

    from cloudaae_tpu.config import Config, config_from_dict

    cfg = Config().replace(
        model=dataclasses.replace(Config().model, rot_rep="6d"),
    )
    d = dataclasses.asdict(cfg)
    # json round-trip turns tuples into lists; simulate it
    import json

    d = json.loads(json.dumps(d))
    d["model"]["some_future_field"] = 123  # unknown keys must be ignored
    back = config_from_dict(d)
    assert back == cfg
