"""Logging/metrics utilities and journal edge cases."""

import json
import logging
import os

from jpdvt_mt_ntnu_tpu.eval.journal import ProgressJournal
from jpdvt_mt_ntnu_tpu.utils.logging import (
    MetricWriter,
    auto_experiment_dir,
    rank0_logger,
    setup_logging,
)


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), config={"lr": 1e-4}, run_name="t")
    w.log({"loss": 0.5}, step=1)
    w.log({"loss": 0.25, "acc": 1.0}, step=2)
    w.finish(summary={"final": 0.25})
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 0.5 and lines[0]["step"] == 1
    assert lines[1]["acc"] == 1.0
    assert lines[-1]["step"] == -1  # summary record
    assert json.load(open(tmp_path / "run_config.json"))["lr"] == 1e-4


def test_metric_writer_non_main_noop(tmp_path):
    w = MetricWriter(str(tmp_path / "x"), is_main=False)
    w.log({"a": 1}, 0)
    w.finish()
    assert not os.path.exists(tmp_path / "x")


def test_auto_experiment_dir_numbering(tmp_path):
    d0 = auto_experiment_dir(str(tmp_path), "imagenet", "JPDVT", crop=True)
    d1 = auto_experiment_dir(str(tmp_path), "texmet", "JPDVT-T",
                             with_mask=True)
    assert os.path.basename(d0) == "000-imagenet-JPDVT-crop"
    assert os.path.basename(d1) == "001-texmet-JPDVT-T-withmask"
    assert os.path.isdir(d0) and os.path.isdir(d1)


def test_dual_loggers(tmp_path):
    logger, err = setup_logging(str(tmp_path), name="t1")
    logger.info("hello world")
    err.error("bad thing")
    for h in logger.handlers + err.handlers:
        h.flush()
    assert "hello world" in open(tmp_path / "inference_log.txt").read()
    err_txt = open(tmp_path / "inference_errors.txt").read()
    assert "bad thing" in err_txt
    assert "hello world" not in err_txt


def test_rank0_logger_silent_on_other_ranks(tmp_path, capsys):
    lg = rank0_logger(False)
    lg.info("should not appear")
    assert "should not appear" not in capsys.readouterr().out
    lg0 = rank0_logger(True, str(tmp_path / "exp"))
    lg0.info("visible")
    for h in lg0.handlers:
        h.flush()
    assert "visible" in open(tmp_path / "exp" / "log.txt").read()
    # avoid handler leakage across tests
    logging.getLogger("jpdvt.train").handlers.clear()


def test_journal_empty_and_malformed(tmp_path):
    j = ProgressJournal(str(tmp_path))
    state = j.load()
    assert state.count == 0 and state.accuracy(9) == (0.0, 0.0)
    j.append("a.jpg", 1, 9, 0.5)
    j.append("b.jpg", 0, 3, 0.7)
    j.close()
    state = j.load()
    assert state.count == 2
    assert state.accuracy(9) == (0.5, (9 + 3) / 18)
    assert state.total_time == 1.2