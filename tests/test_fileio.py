"""utils/fileio.py — FileClient backends, load/dump handlers, parse
utilities (mmcv/mmcv/fileio parity)."""
import numpy as np
import pytest

from sm3det_tpu.utils import fileio as fio


def test_load_dump_roundtrip(tmp_path):
    obj = {"a": 1, "b": [1, 2, 3], "c": "x"}
    for ext in ("json", "pkl", "yaml"):
        p = str(tmp_path / f"f.{ext}")
        fio.dump(obj, p)
        assert fio.load(p) == obj


def test_pickle_numpy_roundtrip(tmp_path):
    arr = np.arange(12).reshape(3, 4)
    p = str(tmp_path / "a.pkl")
    fio.dump(arr, p)
    np.testing.assert_array_equal(fio.load(p), arr)


def test_memory_backend_roundtrip():
    fio.dump([1, 2], "memory://box.json")
    assert fio.load("memory://box.json") == [1, 2]
    c = fio.FileClient.infer_client("memory://box.json")
    assert c.backend_name == "memory"
    assert c.exists("memory://box.json")
    assert not c.exists("memory://nope")


def test_register_backend():
    class Upper(fio.MemoryBackend):
        def get(self, path):
            return super().get(path).upper()

    fio.FileClient.register_backend("upper", Upper)
    fio.FileClient("memory").put(b"abc", "k")
    assert fio.FileClient("upper").get("k") == b"ABC"


def test_list_from_file(tmp_path):
    p = tmp_path / "imgset.txt"
    p.write_text("P0001\nP0002\nP0003\nP0004\n")
    assert fio.list_from_file(str(p)) == ["P0001", "P0002", "P0003",
                                          "P0004"]
    assert fio.list_from_file(str(p), prefix="img/") == [
        "img/P0001", "img/P0002", "img/P0003", "img/P0004"]
    assert fio.list_from_file(str(p), offset=2) == ["P0003", "P0004"]
    assert fio.list_from_file(str(p), max_num=2) == ["P0001", "P0002"]


def test_dict_from_file(tmp_path):
    p = tmp_path / "map.txt"
    p.write_text("1 cat\n2 dog cow\n")
    d = fio.dict_from_file(str(p))
    assert d == {"1": "cat", "2": ["dog", "cow"]}
    d = fio.dict_from_file(str(p), key_type=int)
    assert d == {1: "cat", 2: ["dog", "cow"]}
    with pytest.raises(AssertionError):
        bad = tmp_path / "bad.txt"
        bad.write_text("only_key\n")
        fio.dict_from_file(str(bad))
