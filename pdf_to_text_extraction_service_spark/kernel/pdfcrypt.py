"""PDF standard security handler (PDF 32000 §7.6.3-7.6.4) — the
empty-user-password decryption path poppler applies silently
(reference: poppler.go:51-164 shells out to pdftotext, which opens
most "protected" web PDFs because they encrypt with an owner password
only). Supports /V 1/2 (RC4 40..128-bit), /V 4 with /AESV2
(AES-128-CBC), and /V 5 /R 5/6 (AES-256 with the SHA-2 family
key-derivation of PDF 2.0 Algorithm 2.B). Real passwords raise
PDFCryptError — the hybrid pipeline routes those documents to
needs-ocr, keeping the reference's behavior envelope.

RC4 is implemented inline (stream cipher, ~15 lines); AES-CBC uses
the preinstalled ``cryptography`` package behind an import-try.
"""

from __future__ import annotations

import hashlib
import re
import struct

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


class PDFCryptError(Exception):
    pass


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _aes_cbc_raw(key: bytes, iv: bytes, data: bytes,
                 encrypt: bool = False) -> bytes:
    """AES-CBC without padding (Algorithm 2.B mixing + UE unwrap)."""
    try:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes,
        )
    except ImportError as exc:  # pragma: no cover - baked into image
        raise PDFCryptError("no AES backend available") from exc
    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """PDF 2.0 Algorithm 2.B (R6) iterated SHA-2 hash; R5 uses just
    the first SHA-256 (call with ``r5=True`` via hash_r5)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_raw(k[:16], k[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    if len(data) < 32 or len(data) % 16:
        raise PDFCryptError("bad AES stream length")
    try:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes,
        )
    except ImportError as exc:  # pragma: no cover - baked into image
        raise PDFCryptError("no AES backend available") from exc
    iv, body = data[:16], data[16:]
    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    plain = dec.update(body) + dec.finalize()
    pad = plain[-1]
    if not 1 <= pad <= 16:
        raise PDFCryptError("bad AES padding")
    return plain[:-pad]


# ------------------------------------------------------- dict parsing

def _dict_depth(buf: bytes, pos: int) -> int:
    """<<…>> nesting depth at byte offset `pos` (sub-dictionaries such
    as /CF << /StdCF << … >> >> sit at a deeper level than the
    top-level /Encrypt keys)."""
    head = buf[:pos]
    return head.count(b"<<") - head.count(b">>")


def _dict_int(head: bytes, key: bytes, default: int | None = None) -> int:
    # Anchor with a name-delimiter lookahead so /V never matches /VE,
    # and prefer the shallowest match so the crypt-filter sub-dict's
    # /Length 16 never shadows the top-level /Length 128.
    best: tuple[int, int, int] | None = None
    for m in re.finditer(rb"/" + key + rb"(?![A-Za-z])\s+(-?\d+)", head):
        cand = (_dict_depth(head, m.start()), m.start(), int(m.group(1)))
        if best is None or cand[0] < best[0]:
            best = cand
    if best is None:
        if default is None:
            raise PDFCryptError(f"/Encrypt missing /{key.decode()}")
        return default
    return best[2]


def pdf_string_after(buf: bytes, key: bytes) -> bytes | None:
    """Parse the PDF string value following /key: literal (…) with
    escapes, or hex <…>. Tries every delimited occurrence of /key
    (shallowest dict depth first) so /U is never confused with /UE
    and a sub-dictionary key never shadows the top-level one."""
    starts = [(_dict_depth(buf, m.start()), m.start(), m.end())
              for m in re.finditer(rb"/" + key + rb"(?![A-Za-z])\s*", buf)]
    for _, _, end in sorted(starts):
        val = _string_value_at(buf, end)
        if val is not None:
            return val
    return None


def _string_value_at(buf: bytes, i: int) -> bytes | None:
    if i >= len(buf):
        return None
    if buf[i:i + 1] == b"<":
        j = buf.find(b">", i)
        hexs = re.sub(rb"\s", b"", buf[i + 1:j])
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("latin-1"))
    if buf[i:i + 1] != b"(":
        return None
    out = bytearray()
    i += 1
    depth = 1
    while i < len(buf):
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            e = buf[i:i + 1]
            esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                   b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}
            if e in esc:
                out += esc[e]
                i += 1
            elif e.isdigit():
                k = 0
                oct_ = 0
                while k < 3 and buf[i:i + 1].isdigit():
                    oct_ = oct_ * 8 + (buf[i] - 0x30)
                    i += 1
                    k += 1
                out.append(oct_ & 0xFF)
            else:
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out)
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return None


# ------------------------------------------------------ the handler


class StandardDecryptor:
    """Key schedule + per-object decryption for the standard handler,
    empty user password. Raises PDFCryptError when the document needs
    a real password or uses an unsupported /V."""

    def __init__(self, encrypt_body: bytes, id0: bytes):
        if b"/Standard" not in encrypt_body:
            raise PDFCryptError("unsupported security handler")
        v = _dict_int(encrypt_body, b"V", 0)
        r = _dict_int(encrypt_body, b"R")
        if v == 5 and r in (5, 6):
            self.v, self.r = v, r
            self._init_v5(encrypt_body)
            return
        if v not in (1, 2, 4) or r not in (2, 3, 4):
            raise PDFCryptError(f"unsupported encryption V={v} R={r}")
        self.v, self.r = v, r
        length_bits = _dict_int(encrypt_body, b"Length", 40)
        self.key_len = 5 if r == 2 else length_bits // 8
        o = pdf_string_after(encrypt_body, b"O")
        u = pdf_string_after(encrypt_body, b"U")
        if o is None or u is None or len(o) < 32 or len(u) < 32:
            raise PDFCryptError("/Encrypt missing /O or /U")
        p = _dict_int(encrypt_body, b"P")
        self.aes = False
        if v == 4:
            # crypt filter: /StmF names the filter; we support the
            # common /StdCF with /CFM /AESV2 or /V2
            if b"/AESV2" in encrypt_body:
                self.aes = True
                self.key_len = 16
            elif b"/V2" not in encrypt_body:
                raise PDFCryptError("unsupported crypt filter")
        self.encrypt_metadata = b"/EncryptMetadata false" not in \
            encrypt_body
        self.key = self._file_key(o[:32], p, id0)
        if not self._check_user_password(u[:32], id0):
            raise PDFCryptError("password protected (non-empty user "
                                "password)")

    def _init_v5(self, body: bytes) -> None:
        """AES-256 (PDF 2.0 §7.6.4.4): validate the EMPTY user
        password against /U, unwrap the file key from /UE. R6 uses
        the iterated Algorithm 2.B hash; R5 (the deprecated Adobe
        extension) a single SHA-256."""
        u = pdf_string_after(body, b"U")
        ue = pdf_string_after(body, b"UE")
        if u is None or ue is None or len(u) < 48 or len(ue) < 32:
            raise PDFCryptError("/Encrypt missing /U or /UE")
        vsalt, ksalt = u[32:40], u[40:48]

        def h(salt: bytes) -> bytes:
            if self.r == 5:
                return hashlib.sha256(b"" + salt).digest()
            return _hash_2b(b"", salt, b"")

        if h(vsalt) != u[:32]:
            raise PDFCryptError("password protected (non-empty user "
                                "password)")
        self.key = _aes_cbc_raw(h(ksalt), b"\x00" * 16, ue[:32])
        self.aes = True
        self.key_len = 32
        self.encrypt_metadata = b"/EncryptMetadata false" not in body

    def _file_key(self, o: bytes, p: int, id0: bytes) -> bytes:
        h = hashlib.md5()
        h.update(_PAD)              # empty user password → pad only
        h.update(o)
        # some producers write /P in unsigned 32-bit form — mask to
        # the same 4 little-endian bytes either way
        h.update(struct.pack("<I", p & 0xFFFFFFFF))
        h.update(id0)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:self.key_len]).digest()
        return key[:self.key_len]

    def _check_user_password(self, u: bytes, id0: bytes) -> bool:
        if self.r == 2:
            return rc4(self.key, _PAD) == u
        h = hashlib.md5(_PAD + id0).digest()
        enc = rc4(self.key, h)
        for i in range(1, 20):
            enc = rc4(bytes(b ^ i for b in self.key), enc)
        return enc == u[:16]

    def object_key(self, num: int, gen: int = 0) -> bytes:
        if self.v == 5:
            return self.key  # AES-256 uses the file key directly
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<I", num)[:3])
        h.update(struct.pack("<H", gen))
        if self.aes:
            h.update(b"sAlT")
        return h.digest()[:min(self.key_len + 5, 16)]

    def decrypt(self, num: int, data: bytes, gen: int = 0) -> bytes:
        k = self.object_key(num, gen)
        if self.aes:
            return _aes_cbc_decrypt(k, data)
        return rc4(k, data)

    def encrypt(self, num: int, data: bytes, gen: int = 0) -> bytes:
        """Fixture-generator hook (RC4 is symmetric; AES adds IV+pad)."""
        k = self.object_key(num, gen)
        if not self.aes:
            return rc4(k, data)
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes,
        )
        iv = hashlib.md5(b"iv" + struct.pack("<I", num)).digest()
        pad = 16 - len(data) % 16
        enc = Cipher(algorithms.AES(k), modes.CBC(iv)).encryptor()
        return iv + enc.update(data + bytes([pad]) * pad) + enc.finalize()


def make_standard_encrypt_dict(v: int, r: int, length_bits: int,
                               id0: bytes) -> tuple[bytes, "StandardDecryptor"]:
    """Generator-side: build an /Encrypt dict (owner password 'own',
    EMPTY user password, permissive /P) plus its working decryptor.

    Follows Algorithms 3 and 4/5: O from the owner password, U from
    the file key. v=5 emits the AES-256 layout (r=5 or 6): /U carries
    hash+salts, /UE wraps a deterministic 32-byte file key."""
    p = -4
    if v == 5:
        r = max(r, 5)
        vsalt = bytes(range(8))
        ksalt = bytes(range(8, 16))
        file_key = hashlib.sha256(b"fixture-file-key" + id0).digest()

        def h(salt: bytes) -> bytes:
            if r == 5:
                return hashlib.sha256(salt).digest()
            return _hash_2b(b"", salt, b"")

        u = h(vsalt) + vsalt + ksalt
        ue = _aes_cbc_raw(h(ksalt), b"\x00" * 16, file_key,
                          encrypt=True)
        body = (b"<< /Filter /Standard /V 5 /R %d /Length 256 /P %d "
                b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                b"/StmF /StdCF /StrF /StdCF "
                b"/U <%s> /UE <%s> /O <%s> /OE <%s> >>"
                % (r, p, u.hex().encode(), ue.hex().encode(),
                   (b"\x00" * 48).hex().encode(),
                   (b"\x00" * 32).hex().encode()))
        return body, StandardDecryptor(body, id0)
    owner = (b"own" + _PAD)[:32]
    # Algorithm 3: O entry
    h = hashlib.md5(owner).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:5 if r == 2 else length_bits // 8]
    o = rc4(okey, _PAD)  # user password empty → pad
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in okey), o)
    # file key (Algorithm 2, empty user password)
    h2 = hashlib.md5()
    h2.update(_PAD)
    h2.update(o)
    h2.update(struct.pack("<i", p))
    h2.update(id0)
    key = h2.digest()
    klen = 5 if r == 2 else length_bits // 8
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:klen]).digest()
    key = key[:klen]
    # U entry (Algorithm 4 / 5)
    if r == 2:
        u = rc4(key, _PAD)
    else:
        uh = hashlib.md5(_PAD + id0).digest()
        u = rc4(key, uh)
        for i in range(1, 20):
            u = rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16
    cf = b""
    if v == 4:
        cf = (b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
              b"/StmF /StdCF /StrF /StdCF")
    body = (b"<< /Filter /Standard /V %d /R %d /Length %d /P %d "
            b"/O <%s> /U <%s>%s >>"
            % (v, r, length_bits, p, o.hex().encode(),
               u.hex().encode(), cf))
    return body, StandardDecryptor(body, id0)
