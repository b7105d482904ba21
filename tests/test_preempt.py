"""Preemption-safe training + the shared resume path (utils/preempt,
cli/common.save_resume/load_resume).

The reference has neither resume nor signal handling (SURVEY §5: a crash
restarts manually from the last best checkpoint).  Here SIGTERM breaks the
train loop at a batch boundary, the driver saves a full resume checkpoint,
and ``--resume`` restarts the interrupted epoch with the controller's
temperature re-derived exactly (the save carries the PRE-epoch temperature;
the deterministic bang-bang update replays the step).
"""

import json
import os
import signal
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_fixture(root):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_fixture

    make_fixture.make(str(root))
    cfg = {
        "image_root": os.path.join(str(root), "images"),
        "ann_root": os.path.join(str(root), "annotation"),
        "pretrained": "",
        "bert_vocab": os.path.join(str(root), "vocab.txt"),
        "vit": "tiny", "batch_size_train": 4, "batch_size_test": 4,
        "sd_dim": 64, "sd_num": 10, "image_size": 96,
        "weight_decay": 0.05, "init_lr": 3e-4, "min_lr": 0.0, "p": 0.5,
    }
    return cfg


def _write_yaml(path, cfg):
    import yaml

    yaml.safe_dump(cfg, open(path, "w"))


def test_guard_single_process_immediate():
    from madtp_tpu.utils.preempt import PreemptionGuard

    g = PreemptionGuard(signals=(signal.SIGUSR1,))
    assert not g.should_stop() and not g.triggered
    os.kill(os.getpid(), signal.SIGUSR1)
    assert g.should_stop() and g.triggered
    assert g.sync_now()


def test_guard_request_stop_and_chaining():
    from madtp_tpu.utils.preempt import PreemptionGuard

    seen = []
    prev = signal.signal(signal.SIGUSR1, lambda s, f: seen.append(s))
    try:
        g = PreemptionGuard(signals=(signal.SIGUSR1,))
        os.kill(os.getpid(), signal.SIGUSR1)
        assert seen == [signal.SIGUSR1]  # previous handler still ran
        assert g.should_stop()
        g2 = PreemptionGuard(signals=(signal.SIGUSR1,))
        g2.request_stop()
        assert g2.sync_now()
    finally:
        signal.signal(signal.SIGUSR1, prev)


def test_nlvr_preempt_then_resume(tmp_path, monkeypatch, capsys):
    """Programmatic preemption (FakeGuard stops after a few polls) mid-run,
    then --resume restarts the interrupted epoch EXACTLY-ONCE: already
    trained batches are skipped via the deterministic batch schedule and
    the controller temperature is re-derived."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from madtp_tpu.utils import preempt as preempt_mod

    cfg = _make_fixture(tmp_path / "fix")
    cfg["max_epoch"] = 4
    ypath = str(tmp_path / "nlvr.yaml")
    _write_yaml(ypath, cfg)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")

    real_guard = preempt_mod.PreemptionGuard

    class FakeGuard(real_guard):
        polls = 0

        def should_stop(self):
            FakeGuard.polls += 1
            if FakeGuard.polls == 3:  # after batch 1 of epoch 1 (2/epoch)
                self.request_stop()
            return super().should_stop()

    monkeypatch.setattr(preempt_mod, "PreemptionGuard", FakeGuard)
    monkeypatch.setattr(
        sys, "argv",
        ["x", "--config", ypath, "--output_dir", out1, "--pretrained", "",
         "--epoch", "4", "--dp", "off"])  # no mesh batch padding: keep the
    # 2-batch epochs this test's poll arithmetic assumes
    from madtp_tpu.cli.compress_nlvr import main

    main()
    assert os.path.isdir(os.path.join(out1, "resume_ckpt"))
    log1 = [json.loads(l) for l in open(os.path.join(out1, "log.txt"))]
    done1 = {e["epoch"] for e in log1}
    assert max(done1) < cfg["max_epoch"] - 1  # stopped early

    monkeypatch.setattr(preempt_mod, "PreemptionGuard", real_guard)
    monkeypatch.setattr(
        sys, "argv",
        ["x", "--config", ypath, "--output_dir", out2, "--pretrained", "",
         "--epoch", "4", "--dp", "off",
         "--resume", os.path.join(out1, "resume_ckpt")])
    capsys.readouterr()
    main()
    resumed_out = capsys.readouterr().out
    # exactly-once: the one trained batch of the interrupted epoch skips
    assert "skipping 1 trained batches" in resumed_out
    log2 = [json.loads(l) for l in open(os.path.join(out2, "log.txt"))]
    epochs2 = [e["epoch"] for e in log2]
    # restarts the INTERRUPTED epoch (last completed + 1) and finishes
    assert epochs2[0] == max(done1) + 1
    assert epochs2[-1] == cfg["max_epoch"] - 1
    # interrupted-epoch temperature re-derived exactly: epoch E's logged
    # temperature in the resumed run must continue the pre-search-free
    # bang-bang ladder (fixture target is far below cur_g, so one -1.0
    # step per completed epoch from 1.0)
    t2 = float(log2[0]["train_temperature"])
    assert t2 == pytest.approx(1.0 - epochs2[0] * 1.0)


def test_sigterm_subprocess_saves_resume(tmp_path):
    """A real SIGTERM to a training process exits cleanly (code 0) after
    writing the resume checkpoint."""
    cfg = _make_fixture(tmp_path / "fix")
    cfg["max_epoch"] = 500
    ypath = str(tmp_path / "nlvr.yaml")
    _write_yaml(ypath, cfg)
    out = str(tmp_path / "o")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys, os, signal, threading, time\n"
        f"sys.argv=['x','--config',{ypath!r},'--output_dir',{out!r},"
        "'--pretrained','','--epoch','500']\n"
        "def k():\n"
        "    time.sleep(25); os.kill(os.getpid(), signal.SIGTERM)\n"
        "threading.Thread(target=k, daemon=True).start()\n"
        "from madtp_tpu.cli.compress_nlvr import main\n"
        "main()\n"
        "print('CLEAN_EXIT')\n")
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CLEAN_EXIT" in r.stdout
    assert "preempted" in r.stdout
    assert os.path.isdir(os.path.join(out, "resume_ckpt"))


def test_save_load_resume_roundtrip(tmp_path):
    """The shared helper round-trips an arbitrary pytree (orbax path)."""
    import jax.numpy as jnp

    from madtp_tpu.cli.common import load_resume, save_resume

    state = {"a": jnp.arange(6.0).reshape(2, 3),
             "b": (jnp.ones((4,), jnp.int32), {"c": jnp.float32(2.5)})}
    meta = {"epoch": 3, "temperature": 1.5, "cur_gflops": 66.3, "best": 0.7}
    path = save_resume(str(tmp_path), state, meta)
    template = {"a": jnp.zeros((2, 3)),
                "b": (jnp.zeros((4,), jnp.int32), {"c": jnp.float32(0.0)})}
    got, meta2 = load_resume(path, template,
                             {"epoch": 0, "temperature": 0.0,
                              "cur_gflops": 0.0, "best": 0.0})
    np.testing.assert_array_equal(np.asarray(got["a"]), np.asarray(state["a"]))
    np.testing.assert_array_equal(np.asarray(got["b"][0]),
                                  np.asarray(state["b"][0]))
    assert float(got["b"][1]["c"]) == 2.5
    assert int(meta2["epoch"]) == 3 and float(meta2["best"]) == 0.7
