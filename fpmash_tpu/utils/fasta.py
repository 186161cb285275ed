"""FASTA / FASTQ / gzip sequence readers and writers.

Replaces the reference's three ad-hoc line parsers (lyn2vec
fingerprint_utils.py:134-308 ``read_fasta``/``read_long_fasta``/``read_gz``)
and, for the classic sketch path, the kseq streaming parser
(mash/src/mash/kseq.h).  One streaming parser handles all formats; records
are ``(name, comment, sequence)`` tuples.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterable, Iterator, NamedTuple


class SeqRecord(NamedTuple):
    name: str
    comment: str
    seq: str


def _open_text(path: str):
    if path == "-":  # stdin, like the reference's gzdopen(fileno(stdin))
        import sys

        return io.StringIO(sys.stdin.read())
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path)


def read_sequences(path: str, native: bool = True) -> Iterator[SeqRecord]:
    """Stream records from a FASTA or FASTQ file (optionally .gz).

    FASTA: ``>name comment`` header, multi-line sequence.
    FASTQ: 4-line records ``@name comment / seq / + / qual``.
    Format is sniffed from the first non-empty character, like kseq.

    Uses the native C++ batch parser when available (non-gz inputs); the
    two parsers are asserted equivalent in tests.
    """
    if native and path != "-" and not path.endswith(".gz"):
        try:
            from fpmash_tpu.utils.native import parse_seq_file

            parsed = parse_seq_file(path)
        except Exception:
            parsed = None
        if parsed is not None:
            names, comments, blob, offsets = parsed
            text = blob.decode("ascii", "replace")
            for i, name in enumerate(names):
                yield SeqRecord(name, comments[i], text[offsets[i] : offsets[i + 1]])
            return

    with _open_text(path) as fh:
        first = fh.read(1)
        while first in ("\n", "\r", " "):
            first = fh.read(1)
        if first == "":
            return
        if first == ">":
            yield from _read_fasta(fh)
        elif first == "@":
            yield from _read_fastq(fh)
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


def _split_header(line: str) -> tuple[str, str]:
    # kseq keeps everything after the first whitespace run (including a
    # trailing \r on CRLF files) as the comment; preserved for byte-parity
    # of sketch comments.
    line = line.rstrip("\n")
    parts = line.split(None, 1)
    name = parts[0] if parts else ""
    comment = parts[1] if len(parts) > 1 else ""
    return name, comment


def _read_fasta(fh) -> Iterator[SeqRecord]:
    # The caller consumed the leading '>'.
    name, comment = _split_header(fh.readline())
    chunks: list[str] = []
    for line in fh:
        if line.startswith(">"):
            yield SeqRecord(name, comment, "".join(chunks))
            name, comment = _split_header(line[1:])
            chunks = []
        else:
            chunks.append(line.strip())
    yield SeqRecord(name, comment, "".join(chunks))


def _read_fastq(fh) -> Iterator[SeqRecord]:
    # The caller consumed the leading '@'.
    header = fh.readline()
    while True:
        name, comment = _split_header(header)
        seq = fh.readline().strip()
        plus = fh.readline()
        qual = fh.readline()
        if not qual:
            if seq:
                yield SeqRecord(name, comment, seq)
            return
        yield SeqRecord(name, comment, seq)
        header = fh.readline()
        if not header:
            return
        if header.startswith("@"):
            header = header[1:]


def write_fasta(path: str, records: Iterable[tuple[str, str]], width: int = 70) -> None:
    """Write ``(header, seq)`` pairs as FASTA with fixed line width.

    Mirrors lyn2vec's generator output (lyn2vec.py:211-225, width 70).
    """
    with open(path, "w") as fh:
        for header, seq in records:
            fh.write(f">{header}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")


def write_fastq(path: str, records: Iterable[tuple[str, str]], width: int = 70) -> None:
    """Write ``(header, seq)`` pairs as FASTQ with dummy qualities.

    The reference writes the sequence wrapped at 70 chars but the quality
    line unwrapped at full length (lyn2vec.py:217-223) — preserved.
    """
    with open(path, "w") as fh:
        for header, seq in records:
            wrapped = "\n".join(seq[i : i + width] for i in range(0, len(seq), width))
            fh.write(f"@{header}\n{wrapped}\n+\n{'I' * len(seq)}\n")
