"""OLE2 / Compound File Binary reader (MS-CFB), from scratch.

The container under every legacy Office file (.doc/.xls/.ppt — the
formats the reference converts via LibreOffice,
internal/extractors/office/legacy.go:38-59). This reader gives the
offline engine native access to the same documents: header → DIFAT →
FAT chains for regular streams, miniFAT chains inside the root
entry's ministream for streams under the 4096-byte cutoff, and the
directory tree for stream lookup by name.

Pure structure parsing; never executes anything. Raises CFBError on
malformed input — the router converts that to a failure row.
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC

_MAX_CHAIN = 1 << 22  # sector-chain loop guard (4 M sectors = 2 GB)


class CFBError(Exception):
    pass


class DirEntry:
    __slots__ = ("name", "type", "left", "right", "child", "start",
                 "size", "sid")

    def __init__(self, raw: bytes, sid: int):
        name_len = struct.unpack_from("<H", raw, 64)[0]
        name_len = min(name_len, 64)
        self.name = raw[: max(0, name_len - 2)].decode(
            "utf-16-le", errors="replace")
        self.type = raw[66]
        self.left, self.right, self.child = struct.unpack_from(
            "<iii", raw, 68)
        self.start = struct.unpack_from("<I", raw, 116)[0]
        self.size = struct.unpack_from("<Q", raw, 120)[0]
        self.sid = sid


class CFB:
    """Parsed compound file: ``streams`` maps '/'-joined path (root
    name omitted) to bytes."""

    def __init__(self, data: bytes, directory_only: bool = False):
        if len(data) < 512 or data[:8] != MAGIC:
            raise CFBError("not an OLE2 compound file")
        (sector_shift, mini_shift) = struct.unpack_from("<HH", data, 30)
        if sector_shift not in (9, 12):
            raise CFBError(f"bad sector shift {sector_shift}")
        self.data = data
        self.ssz = 1 << sector_shift
        self.mssz = 1 << mini_shift
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)
        self._load_fat()
        self._load_dir()
        if directory_only:
            # sniffing needs only entry names (top_level_names); skip
            # ministream + stream payload materialization
            return
        self._load_minifat()
        self._load_streams()

    def top_level_names(self) -> list[str]:
        """Names of the root storage's DIRECT children, red-black-tree
        order flattened left/self/right — the cheap directory peek the
        mimetype resolvers use (no stream payloads touched)."""
        names: list[str] = []
        seen: set[int] = set()

        def walk(sid: int) -> None:
            if sid < 0 or sid >= len(self.entries) or sid in seen:
                return
            seen.add(sid)
            e = self.entries[sid]
            walk(e.left)
            if e.type in (1, 2):
                names.append(e.name)
            walk(e.right)

        walk(self.root.child)
        return names

    # ---------------------------------------------------------- sectors

    def _sector(self, sid: int) -> bytes:
        # MS-CFB §2.1: sector offset = (sid + 1) << sector_shift —
        # for v3 that is 512 + sid*512; for v4 (4096-byte sectors)
        # the header block is padded to a full sector
        off = (sid + 1) * self.ssz
        if off + self.ssz > len(self.data):
            raise CFBError(f"sector {sid} out of range")
        return self.data[off:off + self.ssz]

    def _load_fat(self) -> None:
        difat: list[int] = list(
            struct.unpack_from("<109I", self.data, 76))
        sid = self.difat_start
        guard = 0
        while sid not in (FREESECT, ENDOFCHAIN) and guard < self.n_difat + 1:
            sec = self._sector(sid)
            ents = struct.unpack(f"<{self.ssz // 4}I", sec)
            difat.extend(ents[:-1])
            sid = ents[-1]
            guard += 1
        fat: list[int] = []
        for fsid in difat:
            if fsid in (FREESECT, ENDOFCHAIN):
                continue
            fat.extend(struct.unpack(
                f"<{self.ssz // 4}I", self._sector(fsid)))
        self.fat = fat

    def _chain(self, start: int, table: list[int]) -> list[int]:
        out = []
        sid = start
        while sid not in (FREESECT, ENDOFCHAIN):
            if sid >= len(table) or len(out) > _MAX_CHAIN:
                raise CFBError("broken sector chain")
            out.append(sid)
            sid = table[sid]
        return out

    def _read_chain(self, start: int, size: int) -> bytes:
        buf = b"".join(self._sector(s) for s in self._chain(start, self.fat))
        if len(buf) < size:
            raise CFBError("stream shorter than directory size")
        return buf[:size]

    # -------------------------------------------------------- directory

    def _load_dir(self) -> None:
        raw = b"".join(self._sector(s)
                       for s in self._chain(self.dir_start, self.fat))
        self.entries = [
            DirEntry(raw[i:i + 128], i // 128)
            for i in range(0, len(raw) - 127, 128)
        ]
        if not self.entries or self.entries[0].type != 5:
            raise CFBError("missing root directory entry")
        self.root = self.entries[0]

    def _load_minifat(self) -> None:
        self.minifat: list[int] = []
        if self.n_minifat and self.minifat_start not in (FREESECT,
                                                         ENDOFCHAIN):
            raw = b"".join(
                self._sector(s)
                for s in self._chain(self.minifat_start, self.fat))
            self.minifat = list(
                struct.unpack(f"<{len(raw) // 4}I", raw))
        # the ministream itself is a regular FAT stream off the root
        self.ministream = b""
        if self.root.start not in (FREESECT, ENDOFCHAIN):
            self.ministream = self._read_chain(
                self.root.start, self.root.size)

    def _read_mini(self, start: int, size: int) -> bytes:
        parts = []
        for sid in self._chain(start, self.minifat):
            off = sid * self.mssz
            if off + self.mssz > len(self.ministream):
                raise CFBError("mini sector out of range")
            parts.append(self.ministream[off:off + self.mssz])
        buf = b"".join(parts)
        if len(buf) < size:
            raise CFBError("mini stream shorter than directory size")
        return buf[:size]

    # ---------------------------------------------------------- streams

    def _load_streams(self) -> None:
        self.streams: dict[str, bytes] = {}
        seen: set[int] = set()

        def walk(sid: int, prefix: str) -> None:
            if sid < 0 or sid >= len(self.entries) or sid in seen:
                return
            seen.add(sid)
            e = self.entries[sid]
            walk(e.left, prefix)
            walk(e.right, prefix)
            if e.type == 2:  # stream
                name = prefix + e.name
                if e.size < self.mini_cutoff:
                    self.streams[name] = self._read_mini(e.start, e.size)
                else:
                    self.streams[name] = self._read_chain(e.start, e.size)
            elif e.type == 1:  # storage
                walk(e.child, prefix + e.name + "/")

        walk(self.root.child, "")

    def stream(self, name: str) -> bytes:
        try:
            return self.streams[name]
        except KeyError:
            raise CFBError(f"no stream {name!r}") from None
