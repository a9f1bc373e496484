"""ARQ extension: request frames + selective-repeat sessions."""

import numpy as np
import pytest

from audio_modem_tpu import arq, channel, framing
from audio_modem_tpu.configs import MODES


class TestRequestFrames:
    def test_payload_roundtrip(self):
        pl = arq.build_request_payload([3, 7, 100000])
        req = arq.parse_request(pl)
        assert isinstance(req, arq.RequestFrame)
        assert req.crc_valid and req.missing == [3, 7, 100000]
        assert not req.is_ack

    def test_ack(self):
        req = arq.parse_request(arq.build_request_payload([]))
        assert req.crc_valid and req.is_ack

    def test_request_over_the_air(self):
        mode = MODES["QPSK"]
        sig = arq.build_request_frame([1, 5, 9], mode)
        req = arq._decode_request(sig, mode)
        assert isinstance(req, arq.RequestFrame), req
        assert req.crc_valid and req.missing == [1, 5, 9]


class TestArqSession:
    def test_clean_channel_single_round(self):
        mode = MODES["QPSK"]
        data = np.random.default_rng(0).bytes(mode.chunk_size * 3 + 10)
        rep = arq.run_arq_session(data, mode, "a.bin", forward=lambda s: s)
        assert rep.complete and rep.data == data
        assert rep.chunks_sent_per_round == [4]

    def test_dropout_triggers_selective_repeat(self):
        mode = MODES["QPSK"]
        rng = np.random.default_rng(1)
        data = rng.bytes(mode.chunk_size * 4)  # 4 chunks
        calls = {"n": 0}

        def lossy_forward(sig):
            calls["n"] += 1
            if calls["n"] == 1:
                # kill a window covering chunk 2's frame on the first pass
                f0 = framing.build_metadata_frame(4, len(data), mode.chunk_size, "b.bin", mode)
                f1 = framing.build_data_chunk_frame(data[: mode.chunk_size], 0, mode)
                start = len(f0) + 2 * len(f1)
                out = sig.copy()
                out[start : start + len(f1)] = 0.0
                return out
            return sig

        rep = arq.run_arq_session(data, mode, "b.bin", forward=lossy_forward, max_rounds=4)
        assert rep.complete, rep
        assert rep.data == data
        assert rep.chunks_sent_per_round[0] == 4
        assert rep.chunks_sent_per_round[1:] == [1]  # only the lost chunk resent

    def test_noisy_back_link_retries(self):
        mode = MODES["QPSK"]
        data = np.random.default_rng(2).bytes(mode.chunk_size + 1)
        back_calls = {"n": 0}

        def flaky_backward(sig):
            back_calls["n"] += 1
            if back_calls["n"] == 1:
                return np.zeros_like(sig)  # first request lost entirely
            return sig

        drop = {"done": False}

        def forward(sig):
            if not drop["done"]:
                drop["done"] = True
                out = sig.copy()
                out[-len(sig) // 3 :] = 0.0  # lose the tail (chunk 1)
                return out
            return sig

        rep = arq.run_arq_session(data, mode, "c.bin", forward=forward, backward=flaky_backward, max_rounds=5)
        assert rep.complete and rep.data == data
        assert back_calls["n"] >= 2  # request was retried after the loss


class TestBatchArqSession:
    """Selective repeat over the BATCHED runtime (VERDICT r3 item 7: the
    scale path previously ended at a missing-chunk report on loss)."""

    def test_64_streams_with_per_stream_dropouts(self):
        mode = MODES["QPSK"]
        rng = np.random.default_rng(7)
        n = 64
        cs = mode.chunk_size
        datas = [rng.bytes(cs * 3) for _ in range(n)]
        names = [f"f{i:02d}.bin" for i in range(n)]

        # frame geometry for targeting one specific chunk per stream
        meta_len = len(framing.build_metadata_frame(3, cs * 3, cs, names[0], mode))
        chunk_len = len(framing.build_data_chunk_frame(datas[0][:cs], 0, mode))
        seen = [0] * n

        def forward(i, sig):
            seen[i] += 1
            if seen[i] == 1 and i % 2 == 0:
                # round 1: kill chunk (i//2 % 3)'s frame on even streams
                k = (i // 2) % 3
                out = sig.copy()
                start = meta_len + k * chunk_len
                out[start : start + chunk_len] = 0.0
                return out
            return sig

        reps = arq.run_batch_arq_session(datas, mode, names, forward, max_rounds=4)
        assert all(r.complete for r in reps), [
            (i, r.chunks_sent_per_round) for i, r in enumerate(reps) if not r.complete
        ]
        for i, r in enumerate(reps):
            assert r.data == datas[i]
            assert r.file_name == names[i]
            assert r.chunks_sent_per_round[0] == 3
            if i % 2 == 0:  # dropped streams actually retransmitted
                assert sum(r.chunks_sent_per_round[1:]) >= 1

    def test_all_clean_single_round(self):
        mode = MODES["QPSK"]
        rng = np.random.default_rng(8)
        datas = [rng.bytes(mode.chunk_size * 2 + 5) for _ in range(4)]
        names = [f"c{i}.bin" for i in range(4)]
        reps = arq.run_batch_arq_session(datas, mode, names, lambda i, s: s)
        assert all(r.complete for r in reps)
        assert all(r.data == d for r, d in zip(reps, datas))
        assert all(r.chunks_sent_per_round == [3] for r in reps)
