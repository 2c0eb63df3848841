"""Pluggable file IO (``mmcv/mmcv/fileio`` capability, fresh minimal
implementation): FileClient with disk/http backends + json/yaml/pickle
handlers behind ``load``/``dump``."""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Optional


class DiskBackend:
    def get(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def get_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def put(self, data: bytes, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


class HTTPBackend:
    def get(self, url: str) -> bytes:
        from urllib.request import urlopen
        with urlopen(url) as r:
            return r.read()

    def get_text(self, url: str) -> str:
        return self.get(url).decode()

    def exists(self, url: str) -> bool:  # pragma: no cover
        return True


class FileClient:
    """Backend selection by prefix (disk default, http(s)://)."""

    _backends = {"disk": DiskBackend, "http": HTTPBackend}

    def __init__(self, backend: Optional[str] = None):
        self.backend_name = backend or "disk"
        self.backend = self._backends[self.backend_name]()

    @classmethod
    def infer_client(cls, uri: str) -> "FileClient":
        if uri.startswith(("http://", "https://")):
            return cls("http")
        return cls("disk")

    def get(self, path):
        return self.backend.get(path)

    def get_text(self, path):
        return self.backend.get_text(path)


_HANDLERS = {
    "json": (lambda s: json.loads(s),
             lambda o: json.dumps(o).encode()),
    "pkl": (lambda s: pickle.loads(s),
            lambda o: pickle.dumps(o)),
}

try:
    import yaml

    _HANDLERS["yaml"] = (lambda s: yaml.safe_load(s),
                         lambda o: yaml.safe_dump(o).encode())
    _HANDLERS["yml"] = _HANDLERS["yaml"]
except ImportError:  # pragma: no cover
    pass


def load(path: str, file_format: Optional[str] = None) -> Any:
    fmt = file_format or path.rsplit(".", 1)[-1]
    client = FileClient.infer_client(path)
    data = client.get(path)
    return _HANDLERS[fmt][0](data)


def dump(obj: Any, path: str, file_format: Optional[str] = None):
    fmt = file_format or path.rsplit(".", 1)[-1]
    data = _HANDLERS[fmt][1](obj)
    DiskBackend().put(data, path)
