"""assemblyStats.py-equivalent outputs (reference: assemblyStats.py:136-470).
The reference is Python 2 + BioPython and cannot run here; expectations are
hand-derived from its exact semantics (strict > for Nx thresholds, 0-based
n:N50 index, NxM absolute ladder, stat.txt column layout)."""
import numpy as np

from disco_tpu.utils.stats import denovo_stat_file, mapped_stat_file


def _write_fasta(path, recs):
    with open(path, "w") as f:
        for desc, seq in recs:
            f.write(f">{desc}\n{seq}\n")


def test_denovo_stat_file(tmp_path):
    # lengths 100, 200, 300, 400 -> total 1000, sorted desc [400,300,200,100]
    recs = [(f"c{i}", "AC" * (n // 2)) for i, n in
            enumerate((100, 300, 400, 200))]
    fa = tmp_path / "ctg.fasta"
    _write_fasta(fa, recs)
    stat = denovo_stat_file(str(fa))
    lines = open(stat).read().splitlines()
    assert lines[0].split("\t") == [
        "n", "n:N50", "min", "N80", "N50", "N20", "N50M", "N100M", "N200M",
        "N300M", "N500M", "N800M", "N1000M", "max", "sum", "filename"]
    vals = lines[1].split("\t")
    # N50: cum 400 <= 500, +300=700 > 500 -> 300; its first index is 1
    # N80: cum 700 <= 800, +200=900 > 800 -> 200
    # N20: 400 > 200 -> 400
    assert vals[:6] == ["4", "1", "100", "200", "300", "400"]
    assert vals[6:13] == ["0"] * 7  # absolute ladder unreachable
    assert vals[13:15] == ["400", "1000"]
    assert vals[15] == str(fa)


def test_denovo_filtered_fasta(tmp_path):
    recs = [("keep me", "A" * 70), ("drop", "A" * 10)]
    fa = tmp_path / "ctg.fasta"
    _write_fasta(fa, recs)
    denovo_stat_file(str(fa), min_len=50)
    filt = (tmp_path / "ctg.filtered.fasta").read_text()
    # only the long record, wrapped at 60 columns like SeqIO.write
    assert filt == ">keep me\n" + "A" * 60 + "\n" + "A" * 10 + "\n"
    vals = open(tmp_path / "ctg.stat.txt").read().splitlines()[1].split("\t")
    assert vals[0] == "1" and vals[14] == "70"


def test_mapped_stat_file(tmp_path):
    ref = tmp_path / "ref.fasta"
    _write_fasta(ref, [("chr1", "G" * 1000)])
    desc = ("ContigName=c1,ContigLength=500,MappedStartPositionInContig=1,"
            "ReferenceID=chr1,MappedStartPositionInReference=101,"
            "MappedLength=400,Insertion=0,Deletion=0,Mismatch=20,"
            "EditDistance=20")
    desc2 = ("ContigName=c2,ContigLength=300,MappedStartPositionInContig=1,"
             "ReferenceID=chr1,MappedStartPositionInReference=301,"
             "MappedLength=100,Insertion=0,Deletion=0,Mismatch=90,"
             "EditDistance=90")
    fa = tmp_path / "ctg.fasta"
    _write_fasta(fa, [(desc, "A" * 500), (desc2, "A" * 300)])
    # no filters: both counted; coverage = union [100,500)+[300,400) = 400
    stat = mapped_stat_file(str(fa), str(ref))
    vals = open(stat).read().splitlines()[1].split("\t")
    assert vals[0] == "2" and vals[7] == "800"
    assert vals[8] == "40.00"
    # quality filter 0.5 drops c2 (1 - 90/100 = 0.1 < 0.5)
    stat = mapped_stat_file(str(fa), str(ref), map_quality=0.5)
    vals = open(stat).read().splitlines()[1].split("\t")
    assert vals[0] == "1" and vals[7] == "500"
    assert vals[8] == "40.00"  # mask still covers [100,500)
    filt = (tmp_path / "ctg.filtered.fasta").read_text()
    assert "c2" not in filt and filt.startswith(">ContigName=c1")
