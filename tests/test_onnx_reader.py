"""ONNX weight reader tests.

torch.onnx.export needs the (absent) onnx package, so the fixture is a
hand-encoded ONNX ModelProto built straight from the protobuf wire spec —
an independent encoder cross-checking the reader's decoder."""

import struct

import numpy as np
import pytest

from cosyvoice_tpu.tools.onnx_reader import read_onnx_weights


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _ld(num: int, payload: bytes) -> bytes:  # length-delimited
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor_raw(name: str, arr: np.ndarray) -> bytes:
    """TensorProto with raw_data, dims as repeated varints."""
    t = b""
    for d in arr.shape:
        t += _field(1, 0, _varint(d))
    code = {np.dtype(np.float32): 1, np.dtype(np.int64): 7, np.dtype(np.float16): 10}[arr.dtype]
    t += _field(2, 0, _varint(code))
    t += _ld(8, name.encode())
    t += _ld(9, arr.tobytes())
    return t


def _tensor_floatdata(name: str, arr: np.ndarray) -> bytes:
    """TensorProto with packed float_data and PACKED dims."""
    t = _ld(1, b"".join(_varint(d) for d in arr.shape))
    t += _field(2, 0, _varint(1))
    t += _ld(8, name.encode())
    t += _ld(4, struct.pack(f"<{arr.size}f", *arr.ravel().tolist()))
    return t


def make_onnx(tensors: bytes) -> bytes:
    graph = tensors + _ld(11, b"g")  # initializers + graph name
    # some producer fields + the graph
    return _field(1, 0, _varint(8)) + _ld(2, b"pytest") + _ld(7, graph)


class TestOnnxReader:
    def test_decodes_raw_and_packed_tensors(self, tmp_path):
        rng = np.random.default_rng(0)
        w1 = rng.standard_normal((8, 4, 3)).astype(np.float32)
        w2 = rng.integers(-5, 5, (7,)).astype(np.int64)
        w3 = rng.standard_normal((2, 5)).astype(np.float16)
        w4 = rng.standard_normal((3, 3)).astype(np.float32)  # float_data variant
        blob = (
            _ld(5, _tensor_raw("conv.weight", w1))
            + _ld(5, _tensor_raw("ids", w2))
            + _ld(5, _tensor_raw("half", w3))
            + _ld(5, _tensor_floatdata("packed.bias", w4))
        )
        p = tmp_path / "model.onnx"
        p.write_bytes(make_onnx(blob))
        weights = read_onnx_weights(str(p))
        assert set(weights) == {"conv.weight", "ids", "half", "packed.bias"}
        np.testing.assert_array_equal(weights["conv.weight"], w1)
        np.testing.assert_array_equal(weights["ids"], w2)
        np.testing.assert_array_equal(weights["half"], w3)
        np.testing.assert_allclose(weights["packed.bias"], w4, atol=1e-6)

    def test_scalar_tensor(self, tmp_path):
        s = np.asarray(3.5, np.float32).reshape(())
        p = tmp_path / "s.onnx"
        p.write_bytes(make_onnx(_ld(5, _tensor_raw("scale", s))))
        w = read_onnx_weights(str(p))
        assert float(w["scale"]) == 3.5

    def test_rejects_non_onnx(self, tmp_path):
        p = tmp_path / "junk.onnx"
        p.write_bytes(b"\x00\x01\x02not a protobuf")
        with pytest.raises(Exception):
            read_onnx_weights(str(p))
