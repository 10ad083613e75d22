"""Pure-Python test oracle for PE-link inference.

Independent re-implementation of the reference algorithm's semantics
(string k-mer hash table, per-read node saturation, pair-count matrices) in
the most literal form possible, used to validate the device kernel
bit-for-bit. Deliberately slow and simple.
"""

import sys

import numpy as np

_RC = {"A": "T", "T": "A", "C": "G", "G": "C"}


def _revcomp(s):
    return "".join(_RC[c] for c in reversed(s))


def build_table(seqs, split_len):
    table = {}
    for i, seq in enumerate(seqs):
        for off in range(len(seq) - split_len + 1):
            kmer = seq[off: off + split_len]
            table.setdefault(kmer, []).append((i, off))
            rk = _revcomp(kmer) if all(c in _RC for c in kmer) else None
            if rk is not None:
                table.setdefault(rk, []).append((i, off))
            else:
                # lowercase / N windows never match uppercase reads
                pass
    return table


def map_single_end(seq, table, seqlens, split_len, n_nodes):
    counts = np.zeros(n_nodes, dtype=int)
    coords = [sys.maxsize] * n_nodes
    kindices = [sys.maxsize] * n_nodes
    rlen = len(seq)
    for i in range(rlen - split_len + 1):
        kmer = seq[i: i + split_len]
        if kmer in table:
            for rid, rcord in table[kmer]:
                counts[rid] += 1
                coords[rid] = min(coords[rid], rcord)
                kindices[rid] = min(kindices[rid], i)
    saturated = []
    for i, v in enumerate(counts):
        if coords[i] == sys.maxsize or kindices[i] == sys.maxsize:
            continue
        L = max(coords[i], coords[i] - kindices[i])
        R = min(coords[i] + seqlens[i] - 1,
                coords[i] - kindices[i] + rlen - 1)
        saturate = R - L - (split_len - 1) + 1
        expected = ((min(rlen, seqlens[i]) - split_len + 1)
                    * (rlen - split_len) / rlen)
        if v >= max(min(saturate, expected), 1):
            saturated.append(i)
    return saturated


def oracle_pe_matrices(seqs, fwd_reads, rve_reads, kmer_size):
    """Returns (node_mat, short_mat, n_reads, short_reads, used)."""
    split_len = kmer_size + 1
    n = len(seqs)
    seqlens = [len(s) for s in seqs]
    table = build_table(seqs, split_len)
    node_mat = np.zeros((n, n), dtype=int)
    short_mat = np.zeros((n, n), dtype=int)
    n_reads = short_reads = used = 0
    for fseq, rseq in zip(fwd_reads, rve_reads):
        if fseq.count("N") or rseq.count("N"):
            n_reads += 1
        elif len(fseq) < split_len or len(rseq) < split_len:
            short_reads += 1
        else:
            used += 1
            lefts = map_single_end(fseq, table, seqlens, split_len, n)
            rights = map_single_end(rseq, table, seqlens, split_len, n)
            k = 0
            for i in lefts:
                for i2 in lefts[k:]:
                    short_mat[i][i2] += 1
                k += 1
            k = 0
            for j in rights:
                for j2 in rights[k:]:
                    short_mat[j][j2] += 1
                k += 1
            for i in lefts:
                for j in rights:
                    node_mat[i][j] += 1
    return node_mat, short_mat, n_reads, short_reads, used
