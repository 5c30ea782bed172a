"""Native TensorBoard event writer (utils/tb_writer.py).

The reference reports scalars through HF Trainer's report_to plumbing
(tensorboard/tensorboardX in requirements.txt:13,22). The writer here
hand-encodes the TFRecord + Event-proto protocol; these tests pin the
wire format against published vectors and round-trip through an
independent in-repo parser, plus the trainer integration via
report_to="tensorboard".
"""

import struct

import numpy as np
import pytest

from tpdm_tpu.utils.tb_writer import (
    EventWriter,
    _masked_crc,
    crc32c,
    encode_scalar_event,
    read_scalar_events,
)


class TestWireFormat:
    def test_crc32c_published_vectors(self):
        # RFC 3720 / Castagnoli check value and the all-zeros vector
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"") == 0

    def test_masked_crc_matches_tfrecord_convention(self):
        # mask(crc) = rotr15(crc) + 0xa282ead8 (mod 2^32)
        crc = crc32c(b"123456789")
        expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert _masked_crc(b"123456789") == expect

    def test_scalar_event_proto_bytes(self):
        # hand-decode the encoder's output field by field
        payload = encode_scalar_event(7, {"loss": 0.5}, wall_time=2.0)
        # field 1 (wall_time, double)
        assert payload[0] == 0x09
        assert struct.unpack("<d", payload[1:9])[0] == 2.0
        # field 2 (step, varint)
        assert payload[9] == 0x10 and payload[10] == 7
        # field 5 (summary, length-delimited)
        assert payload[11] == 0x2A
        summary = payload[13 : 13 + payload[12]]
        # Summary.value -> Value{tag="loss", simple_value=0.5}
        assert summary[0] == 0x0A
        value = summary[2 : 2 + summary[1]]
        assert value[0] == 0x0A and value[1] == 4
        assert value[2:6] == b"loss"
        assert value[6] == 0x15
        assert struct.unpack("<f", value[7:11])[0] == 0.5


class TestRoundTrip:
    def test_write_read(self, tmp_path):
        with EventWriter(str(tmp_path)) as w:
            w.add_scalars(1, {"loss": 0.25, "lr": 1e-6})
            w.add_scalars(2, {"loss": 0.125, "skipme": "str", "ok": True})
            w.add_scalars(3, {})  # no numeric scalars -> no record
            path = w.path
        rows = read_scalar_events(path)
        assert [s for s, _ in rows] == [1, 2]
        np.testing.assert_allclose(rows[0][1]["loss"], 0.25)
        np.testing.assert_allclose(rows[0][1]["lr"], 1e-6, rtol=1e-6)
        assert set(rows[1][1]) == {"loss"}  # bool/str filtered out

    def test_numpy_scalars_accepted(self, tmp_path):
        with EventWriter(str(tmp_path)) as w:
            w.add_scalars(
                1, {"a": np.float32(0.5), "b": np.int64(3), "c": np.bool_(True)}
            )
            path = w.path
        rows = read_scalar_events(path)
        assert rows[0][1] == {"a": 0.5, "b": 3.0}  # numpy bools still out

    def test_truncated_tail_tolerated(self, tmp_path):
        # a writer killed mid-append (watchdog os._exit) leaves a partial
        # record; the reader must stop at the last complete one, like
        # stock TensorBoard, instead of raising struct.error
        with EventWriter(str(tmp_path)) as w:
            w.add_scalars(1, {"x": 1.0})
            w.add_scalars(2, {"x": 2.0})
            path = w.path
        data = open(path, "rb").read()
        open(path, "wb").write(data[:-7])
        rows = read_scalar_events(path)
        assert [s for s, _ in rows] == [1]

    def test_corruption_detected(self, tmp_path):
        with EventWriter(str(tmp_path)) as w:
            w.add_scalars(1, {"x": 1.0})
            path = w.path
        data = bytearray(open(path, "rb").read())
        data[-6] ^= 0xFF  # flip a payload byte of the last record
        open(path, "wb").write(bytes(data))
        with pytest.raises(ValueError, match="crc"):
            read_scalar_events(path)


class TestStatsStreamer:
    def test_streams_flattened_stats(self, tmp_path):
        import glob
        import time

        from tpdm_tpu.utils.tb_writer import StatsStreamer

        calls = [0]

        def stats():
            calls[0] += 1
            return {
                "batches_run": calls[0],
                "denoise_s": {"p50": 0.1, "p95": 0.2},  # nested -> outer/inner
                # two-level nesting: the multi-resolution router's shape
                "resolutions": {"16": {"slot_utilization": 0.75}},
                "note": "text-skipped",
            }

        s = StatsStreamer(stats, str(tmp_path), interval_s=0.05)
        time.sleep(0.2)
        s.stop()
        files = glob.glob(str(tmp_path / "events.out.tfevents.*.stats"))
        assert len(files) == 1
        rows = read_scalar_events(files[0])
        assert len(rows) >= 2  # several ticks + the final stop() snapshot
        step, scalars = rows[-1]
        assert step == len(rows)  # monotonic tick counter
        assert scalars["denoise_s/p50"] == pytest.approx(0.1)
        assert scalars["resolutions/16/slot_utilization"] == pytest.approx(0.75)
        assert "note" not in scalars
        assert scalars["batches_run"] == calls[0]

    def test_stats_fn_failure_never_kills_the_loop(self, tmp_path):
        import time

        from tpdm_tpu.utils.tb_writer import StatsStreamer

        n = [0]

        def flaky():
            n[0] += 1
            if n[0] % 2:
                raise RuntimeError("engine mid-shutdown")
            return {"ok": float(n[0])}

        s = StatsStreamer(flaky, str(tmp_path), interval_s=0.03)
        time.sleep(0.2)
        s.stop()
        rows = read_scalar_events(s._writer.path)
        assert rows  # the even ticks made it through


class TestTrainerIntegration:
    def test_report_to_tensorboard_streams_metrics(self, tmp_path):
        import dataclasses
        import glob
        import sys

        sys.path.insert(0, "tests")
        from test_rloo import _toy_world

        from tpdm_tpu.train.rloo import RLOOTrainer

        config, agent, reward_fn, dataset = _toy_world()
        config = dataclasses.replace(
            config, report_to="tensorboard", output_dir=str(tmp_path)
        )
        trainer = RLOOTrainer(config, agent, reward_fn, dataset)
        trainer.train()
        files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
        assert len(files) == 1
        rows = read_scalar_events(files[0])
        assert [s for s, _ in rows] == [1, 2, 3]
        logged = rows[-1][1]
        # the reference's metric names ride through unchanged
        for key in ("objective/rlhf_reward", "policy/steps_avg", "lr"):
            assert key in logged
        np.testing.assert_allclose(
            logged["policy/steps_avg"],
            trainer.metrics_history[-1]["policy/steps_avg"],
            rtol=1e-6,
        )

    def test_profiler_callback_traces_a_window(self, tmp_path):
        import glob
        import sys

        sys.path.insert(0, "tests")
        from test_rloo import _toy_world

        from tpdm_tpu.train.callbacks import ProfilerCallback
        from tpdm_tpu.train.rloo import RLOOTrainer

        config, agent, reward_fn, dataset = _toy_world()
        cb = ProfilerCallback(str(tmp_path / "profile"), start=1, count=1)
        trainer = RLOOTrainer(
            config, agent, reward_fn, dataset, callbacks=[cb]
        )
        trainer.train()
        assert cb._done and not cb._active
        traces = glob.glob(
            str(tmp_path / "profile" / "plugins" / "profile" / "*" / "*")
        )
        assert traces, "no profiler artifacts written"

    def test_profiler_open_window_closed_on_exit(self, tmp_path):
        import sys

        sys.path.insert(0, "tests")
        from test_rloo import _toy_world

        from tpdm_tpu.train.callbacks import ProfilerCallback
        from tpdm_tpu.train.rloo import RLOOTrainer

        config, agent, reward_fn, dataset = _toy_world()
        # window extends past the 3-update horizon: close() must stop it
        cb = ProfilerCallback(str(tmp_path / "profile"), start=1, count=99)
        trainer = RLOOTrainer(
            config, agent, reward_fn, dataset, callbacks=[cb]
        )
        trainer.train()
        assert not cb._active  # closed, not leaked into the next trace

    def test_bad_report_to_rejected(self):
        import dataclasses
        import sys

        sys.path.insert(0, "tests")
        from test_rloo import _toy_world

        from tpdm_tpu.train.rloo import RLOOTrainer

        config, agent, reward_fn, dataset = _toy_world()
        with pytest.raises(ValueError, match="report_to"):
            RLOOTrainer(
                dataclasses.replace(config, report_to="wandb"),
                agent, reward_fn, dataset,
            )
