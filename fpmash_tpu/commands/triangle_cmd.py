"""`fpmash triangle` — all-pairs lower-triangular matrix
(CommandTriangle.cpp:25-238).

Default output: relaxed Phylip — first line the sequence count, then one
row per reference with tab-separated distances to earlier references.
``-E`` (or any of -v/-d) switches to an edge list.  With ``-fp`` the
comparison is the *positional* ``compareFingerprints``
(CommandTriangle.cpp:265-302) instead of the merge-join.
"""

from __future__ import annotations

import sys

from fpmash_tpu.commands.common import add_sketch_options, expand_inputs, sketch_params_from_args
from fpmash_tpu.models.distance import compare_fingerprints, compare_sketches
from fpmash_tpu.models.sketch import Sketch
from fpmash_tpu.scalar.stats import format_g


def add_parser(sub):
    p = sub.add_parser(
        "triangle",
        help="Estimate a lower-triangular distance matrix.",
    )
    p.add_argument("inputs", nargs="+", metavar="<seq>")
    p.add_argument("-l", "--list", action="store_true")
    p.add_argument("-C", "--comment", action="store_true", help="Use comment fields for sequence names instead of IDs.")
    p.add_argument("-E", "--edge", action="store_true", help="Output edge list instead of Phylip matrix.")
    p.add_argument("-v", "--pvalue", type=float, default=None, help="Maximum p-value to report in edge list. Implies -E.")
    p.add_argument("-d", "--distance", type=float, default=None, help="Maximum distance to report in edge list. Implies -E.")
    p.add_argument("-fp", "--fingerprint", action="store_true")
    p.add_argument("--backend", default="auto", choices=["auto", "jax", "scalar"])
    add_sketch_options(p)
    p.set_defaults(func=run)
    return p


def run(args) -> int:
    edge = args.edge or args.pvalue is not None or args.distance is not None
    max_p = args.pvalue if args.pvalue is not None else 1.0
    max_d = args.distance if args.distance is not None else 1.0

    params = sketch_params_from_args(args, fingerprint=args.fingerprint)
    files = expand_inputs(args.inputs, args.list)
    individual = args.individual or (len(files) == 1 and not args.list)

    sk = Sketch(params)
    txt_inputs = [f for f in files if f.endswith(".txt")]
    other_inputs = [f for f in files if not f.endswith(".txt")]
    if args.fingerprint and txt_inputs:
        sk.init_from_fingerprints(txt_inputs, backend=args.backend)
    if other_inputs:
        sk.init_from_files(other_inputs, individual=individual, backend=args.backend)

    out = sys.stdout
    n = len(sk.references)
    if not edge:
        out.write(f"\t{n}\n")
    sketch_size = sk.params.sketch_size

    # batched device comparisons for large sets
    pos_matches = None
    if args.fingerprint and n >= 64:
        from fpmash_tpu.ops.compare import all_pairs_positional

        pos_matches, pos_minlen = all_pairs_positional(
            [r.hashes for r in sk.references]
        )
    for i in range(n):
        ref = sk.references[i]
        label = ref.comment if args.comment else ref.name
        if not edge:
            out.write(label)
        for j in range(i):
            other = sk.references[j]
            if args.fingerprint and pos_matches is not None:
                from fpmash_tpu.models.distance import PairResult
                from fpmash_tpu.scalar.stats import chisq_sf

                m = int(pos_matches[i, j])
                d = int(pos_minlen[i, j])
                res = PairResult(
                    numer=m,
                    denom=d,
                    distance=1.0 - (m / d) if d else 1.0,
                    pvalue=chisq_sf(m, 1),
                )
                res.passed = res.distance <= max_d and res.pvalue <= max_p
            elif args.fingerprint:
                res = compare_fingerprints(ref.hashes, other.hashes, max_d, max_p)
            else:
                res = compare_sketches(
                    ref.hashes,
                    other.hashes,
                    ref.length,
                    other.length,
                    sketch_size,
                    sk.params.kmer_size,
                    sk.params.kmer_space,
                    max_d if edge else -1.0,
                    max_p if edge else -1.0,
                )
            if edge:
                if res.passed:
                    olabel = other.comment if args.comment else other.name
                    out.write(
                        f"{label}\t{olabel}\t{format_g(res.distance)}\t"
                        f"{format_g(res.pvalue)}\t{res.numer}/{res.denom}\n"
                    )
            else:
                out.write(f"\t{format_g(res.distance)}")
        if not edge:
            out.write("\n")
    return 0
