"""Reference-guided debug evaluation (dev mode, component C26).

The reference shells out to minimap2 at every stage to label nodes /
contigs / strains against known strain references
(/root/reference/utils/VStrains_Utilities.py:34-144,
VStrains_Decomposition.py:1045-1071). Its node-level criterion is
`nm == 0 and match_region == seg_len` — i.e. the node is an *exact
substring* of the strain — so the TPU-native replacement needs no aligner:

  * node -> strain: exact substring containment (either strand), seeded by
    the PE engine's k-mer hashes and verified by direct comparison;
  * contig/strain -> reference: k-mer containment score with the
    reference's 0.999 acceptance (proxy for nmatch/nblock >= 0.999).

These power the same de-facto integration-test role the reference's dev
mode plays (SURVEY.md section 4).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence, Tuple

from vstrains_tpu.algos.tips import kmer_containment
from vstrains_tpu.core.graph import GraphView
from vstrains_tpu.core.seq import revcomp_str

_LOG = logging.getLogger(__name__)


def load_fasta(path: str) -> Dict[str, str]:
    seqs: Dict[str, str] = {}
    name = None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                name = line[1:].split(" ")[0]
                seqs[name] = ""
            elif line and name is not None:
                seqs[name] += line
    return seqs


def map_ref_to_graph(ref_file: str, view: GraphView,
                     logger: logging.Logger = None
                     ) -> Dict[str, List[str]]:
    """strain -> [node ids whose sequence matches the strain exactly]
    (parity: Utilities:34-90, nm==0 full-length criterion)."""
    logger = logger or _LOG
    refs = load_fasta(ref_file)
    strain_dict: Dict[str, List[str]] = {}
    for no, node in view.nodes.items():
        seq = node.seq
        rc = revcomp_str(seq)
        for ref_no, ref_seq in refs.items():
            if seq in ref_seq or rc in ref_seq:
                strain_dict.setdefault(ref_no, []).append(no)
    logger.debug("strain-to-node map")
    for ref_no, nodes in strain_dict.items():
        logger.debug("strains: %s Path: %s", ref_no, nodes)
    return strain_dict


def map_ref_to_contig(contig_dict: dict, view: GraphView, ref_file: str,
                      logger: logging.Logger = None,
                      accept: float = 0.999) -> Dict[str, set]:
    """strain -> {contig ids with >= 99.9%% k-mer containment}
    (parity: Utilities:93-136)."""
    logger = logger or _LOG
    from vstrains_tpu.algos.pathmath import path_ids_to_seq
    refs = load_fasta(ref_file)
    strain_dict: Dict[str, set] = {}
    for cno, (contig, _, _) in contig_dict.items():
        try:
            seq = path_ids_to_seq(view, contig)
        except KeyError:
            continue
        for ref_no, ref_seq in refs.items():
            if kmer_containment(seq, ref_seq) >= accept:
                strain_dict.setdefault(ref_no, set()).add(cno)
    for sno, cnos in strain_dict.items():
        logger.debug("strain %s matched by %d contigs: %s",
                     sno, len(cnos), sorted(cnos))
    return strain_dict


def strain_accuracy(strain_dict: dict, view: GraphView, ref_file: str,
                    logger: logging.Logger = None
                    ) -> List[Tuple[str, str, float]]:
    """Score each reconstructed strain against its best reference."""
    logger = logger or _LOG
    from vstrains_tpu.algos.pathmath import path_ids_to_seq
    refs = load_fasta(ref_file)
    out = []
    for sno, (contig, _, _) in strain_dict.items():
        try:
            seq = path_ids_to_seq(view, contig)
        except KeyError:
            continue
        best_ref, best = None, -1.0
        for ref_no, ref_seq in refs.items():
            s = kmer_containment(seq, ref_seq)
            if s > best:
                best_ref, best = ref_no, s
        out.append((sno, best_ref, best))
        logger.info("strain %s -> %s (containment %.4f)", sno, best_ref,
                    best)
    return out
