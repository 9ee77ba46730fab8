"""Loaders for the reference golden test vectors (copied from GKL src/test)."""

from __future__ import annotations

import dataclasses
import os

import numpy as np

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _phred(s: str, min_clip: int = 0) -> np.ndarray:
    """fastq char -> phred (minus 33), clamped below at min_clip.

    Matches PairHmmUnitTest.normalize (PairHmmUnitTest.java:309-319).
    """
    q = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(np.int16) - 33
    return np.maximum(q, min_clip).astype(np.uint8)


@dataclasses.dataclass
class PairHmmCase:
    hap: np.ndarray
    read: np.ndarray
    q: np.ndarray
    iq: np.ndarray
    dq: np.ndarray
    gcp: np.ndarray
    expected: float


def load_pairhmm_cases() -> list[PairHmmCase]:
    """Parse pairhmm-testdata.txt (104 cases; PairHmmUnitTest.java:200-221)."""
    cases = []
    path = os.path.join(DATA_DIR, "pairhmm-testdata.txt")
    with open(path) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            hap, read, q, iq, dq, gcp, expected = line.split()
            cases.append(
                PairHmmCase(
                    hap=np.frombuffer(hap.encode(), dtype=np.uint8),
                    read=np.frombuffer(read.encode(), dtype=np.uint8),
                    q=_phred(q, 6),
                    iq=_phred(iq),
                    dq=_phred(dq),
                    gcp=_phred(gcp),
                    expected=float(expected),
                )
            )
    return cases


@dataclasses.dataclass
class PDHmmCase:
    hap: np.ndarray  # uint8 bases
    hap_pd: np.ndarray  # uint8 PD flag bytes (bit pattern of the int8 values)
    read: np.ndarray
    q: np.ndarray
    iq: np.ndarray
    dq: np.ndarray
    gcp: np.ndarray
    expected: float


def load_pdhmm_cases(name: str) -> list[PDHmmCase]:
    """Parse pdhmm_syn_*.txt (IntelPDHMMUnitTest.java:199-233).

    Quals are fastqToPhred (minus 33, no clamping); PD bases are a printed
    signed-byte list.
    """
    cases = []
    path = os.path.join(DATA_DIR, name)
    with open(path) as fh:
        header = True
        for line in fh:
            if header:
                header = False
                continue
            if not line.strip():
                continue
            parts = line.rstrip("\n").split("\t")
            hap, pd_str, read, q, iq, dq, gcp, expected = parts
            pd = np.array([int(x) for x in pd_str.strip()[1:-1].split(",")], dtype=np.int8)
            cases.append(
                PDHmmCase(
                    hap=np.frombuffer(hap.encode(), dtype=np.uint8),
                    hap_pd=pd.view(np.uint8),
                    read=np.frombuffer(read.encode(), dtype=np.uint8),
                    q=_phred(q),
                    iq=_phred(iq),
                    dq=_phred(dq),
                    gcp=_phred(gcp),
                    expected=float(expected),
                )
            )
    return cases


def load_pdhmm_new():
    """pdhmm_new.txt (IntelPDHMMUnitTest.newPDHMMTest data): reads block,
    haps block (bases + printed PD-byte list), expected block (read-major
    reads x haps cross product)."""
    path = os.path.join(DATA_DIR, "pdhmm_new.txt")
    with open(path) as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    sections = {"reads": [], "haps": [], "expected": []}
    cur = None
    for ln in lines:
        if ln.startswith("# read-bases"):
            cur = "reads"
            continue
        if ln.startswith("# hap-bases"):
            cur = "haps"
            continue
        if ln.startswith("# expected"):
            cur = "expected"
            continue
        if ln.strip():
            sections[cur].append(ln)
    reads = []
    for ln in sections["reads"]:
        b, q, iq, dq, gcp = ln.split("\t")
        reads.append((
            np.frombuffer(b.encode(), np.uint8),
            _phred(q), _phred(iq), _phred(dq), _phred(gcp),
        ))
    haps = []
    for ln in sections["haps"]:
        b, pd = ln.split("\t")
        pd_bytes = np.array([int(x) for x in pd.strip("[]").split(",")], np.int64)
        haps.append((
            np.frombuffer(b.encode(), np.uint8),
            (pd_bytes & 0xFF).astype(np.uint8),
        ))
    expected = np.array([float(x) for x in sections["expected"]], np.float64)
    return reads, haps, expected
