"""Native readqc.cpp parity vs the Python oracle (disco_tpu/io/readqc.py,
itself a port of the reference's Dataset::testRead,
reference: src/BuildGraph/src/Dataset.cpp:403-451) and native 2-bit packing
vs disco_tpu/utils/dna.py::pack_codes."""
import random

import numpy as np
import pytest

from disco_tpu import native
from disco_tpu.io import readqc
from disco_tpu.utils import dna


def _blob(seqs):
    offs = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offs[1:])
    return "".join(seqs).encode(), offs


def _adversarial_reads():
    rng = random.Random(7)
    reads = []
    # random reads of varied length, including below MIN_READ_SIZE and <= minOvl
    for n in (10, 29, 30, 31, 39, 40, 41, 60, 100, 250):
        for _ in range(20):
            reads.append("".join(rng.choice("ACGT") for _ in range(n)))
    # non-ACGT
    reads.append("ACGTN" + "ACGT" * 20)
    reads.append("acgt" + "ACGT" * 20)  # lower case is non-ACGT at QC level
    # 70% single base
    reads.append("A" * 70 + "CGT" * 10)
    reads.append("A" * 69 + "CGT" * 11)
    # micro-repeat prefixes/suffixes
    for fs in readqc.FILTER_STRINGS[::5]:
        reads.append(fs + "GATTACAGATTACAGATTACA")
        reads.append("GATTACAGATTACAGATTACA" + fs)
    # dimer/trimer saturation
    reads.append("AC" * 25)
    reads.append("ACG" * 20 + "AT" * 15)
    reads.append("GGGGCC" * 8 + "ATCGATCG")
    return reads


def test_qc_parity():
    reads = _adversarial_reads()
    blob, offs = _blob(reads)
    for min_ovl in (30, 40):
        got = native.qc_test_reads(blob, offs, min_ovl)
        want = np.array([readqc.test_read(r, min_ovl) for r in reads])
        assert (got == want).all(), [
            (r, bool(g), bool(w)) for r, g, w in zip(reads, got, want)
            if g != w]
    # make sure the fixture exercises both outcomes
    assert want.any() and (~want).any()


def test_pack_parity():
    rng = random.Random(3)
    seqs = ["".join(rng.choice("ACGT") for _ in range(rng.randrange(30, 120)))
            for _ in range(50)]
    lengths = np.array([len(s) for s in seqs])
    max_len = int(lengths.max())
    n_words = (max_len + dna.BASES_PER_WORD - 1) // dna.BASES_PER_WORD
    blob, offs = _blob(seqs)
    packed, packed_rc = native.pack_reads(blob, offs, n_words)
    assert packed.shape == (len(seqs), n_words + 1)
    codes = np.zeros((len(seqs), max_len), np.uint8)
    codes_rc = np.zeros((len(seqs), max_len), np.uint8)
    for i, s in enumerate(seqs):
        c = dna.encode(s)
        codes[i, :len(s)] = c
        codes_rc[i, :len(s)] = (3 - c)[::-1]
    assert (packed[:, :n_words] == dna.pack_codes(codes, n_words)).all()
    assert (packed[:, n_words] == 0).all()
    assert (packed_rc[:, :n_words] == dna.pack_codes(codes_rc, n_words)).all()
    assert (packed_rc[:, n_words] == 0).all()


def test_pack_rejects_non_acgt():
    seqs = ["ACGT" * 10, "ACGTN" + "A" * 35]
    blob, offs = _blob(seqs)
    with pytest.raises(ValueError, match="read 2"):
        native.pack_reads(blob, offs, 3)


def test_seq_scan_matches_python_reader(tmp_path):
    from disco_tpu.io import fasta

    rng = random.Random(11)
    # FASTA: multi-line wraps, lowercase, an empty-sequence record, a
    # header-only record at EOF
    fa = tmp_path / "x.fasta"
    seqs = ["".join(rng.choice("acgtACGT") for _ in range(rng.randrange(3, 200)))
            for _ in range(40)]
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i} desc\n")
            for p in range(0, len(s), 60):
                f.write(s[p:p + 60] + "\n")
        f.write(">empty\n")
        f.write(">trailing_header_no_newline")
    blob, offs = native.seq_scan(fasta.read_bytes(str(fa)))
    got = [bytes(blob[offs[i]:offs[i + 1]]).decode()
           for i in range(len(offs) - 1)]
    want = list(fasta.read_records(str(fa)))
    assert got == want

    # FASTQ (+ gz), including a no-trailing-newline last record
    fq = tmp_path / "x.fastq"
    with open(fq, "w") as f:
        for i, s in enumerate(seqs[:7]):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
        f.write("@last\nACGTACGT\n+\nIIIIIIII")
    raw = fasta.read_bytes(str(fq))
    blob, offs = native.seq_scan(raw)
    got = [bytes(blob[offs[i]:offs[i + 1]]).decode()
           for i in range(len(offs) - 1)]
    want = list(fasta.read_records(str(fq)))
    assert got == want

    import gzip as _gz
    fqz = tmp_path / "x.fastq.gz"
    with _gz.open(fqz, "wb") as f:
        f.write(raw)
    blob2, offs2 = native.seq_scan(fasta.read_bytes(str(fqz)))
    assert (offs2 == offs).all() and bytes(blob2) == bytes(blob)


def test_streaming_scan_matches_buffer_scan(tmp_path):
    """seq_scan_path / seq_scan_lengths (streaming mmap scanner, exact-size
    output — the production ingest since round 4) must agree byte-for-byte
    with the in-memory seq_scan on every tricky record shape."""
    from disco_tpu import native
    from disco_tpu.io import fasta

    rng = random.Random(23)
    seqs = ["".join(rng.choice("acgtACGT")
                    for _ in range(rng.randrange(3, 200)))
            for _ in range(60)]

    fa = tmp_path / "s.fasta"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i} d\n")
            for p in range(0, len(s), 50):
                f.write(s[p:p + 50] + "\n")
        f.write(">empty\n")
        f.write(">no_newline_tail")
    fq = tmp_path / "s.fastq"
    with open(fq, "w") as f:
        for i, s in enumerate(seqs[:9]):
            f.write(f"@r{i}\n  {s} \n+\n{'I' * len(s)}\n")
        f.write("@last\nACGTACGT\n+\nIIIIIIII")  # no trailing newline

    for path in (fa, fq):
        want_blob, want_offs = native.seq_scan(fasta.read_bytes(str(path)))
        got = native.seq_scan_path(str(path))
        assert got is not None
        blob, offs = got
        assert (offs == want_offs).all()
        assert bytes(blob) == bytes(want_blob[:len(blob)])
        assert len(blob) == want_offs[-1]  # exact-size, no slop
        lens = native.seq_scan_lengths(str(path))
        assert (lens == want_offs).all()

    # empty file: 0 records
    empty = tmp_path / "e.fasta"
    empty.write_text("")
    got = native.seq_scan_path(str(empty))
    assert got is not None
    blob, offs = got
    assert len(offs) == 1 and len(blob) <= 1


def test_iter_record_windows_matches_full_scan(tmp_path):
    """Windowed record extraction must reproduce the whole-file scan
    byte-for-byte on both FASTA and FASTQ, across window boundaries."""
    import numpy as np

    from disco_tpu import native

    rng = np.random.default_rng(5)
    fa = tmp_path / "w.fasta"
    with open(fa, "w") as f:
        for i in range(500):
            seq = "".join(rng.choice(list("ACGT"), 80 + (i % 37)))
            # multi-line records exercise the line-joining path
            f.write(f">r{i} desc\n{seq[:50]}\n{seq[50:]}\n")
    fq = tmp_path / "w.fastq"
    with open(fq, "w") as f:
        for i in range(500):
            seq = "".join(rng.choice(list("ACGT"), 60 + (i % 23)))
            f.write(f"@q{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    for path in (fa, fq):
        full, offs = native.seq_scan_path(str(path))
        want = [bytes(full[offs[i]:offs[i + 1]])
                for i in range(len(offs) - 1)]
        for wb in (512, 4096):
            got = []
            for blob, o, _lo in native.iter_record_windows(str(path),
                                                           window_bytes=wb):
                got.extend(bytes(blob[o[i]:o[i + 1]])
                           for i in range(len(o) - 1))
            assert got == want, (path, wb)
