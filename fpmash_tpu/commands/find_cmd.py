"""`fpmash find` — legacy windowed region search (CommandFind.cpp).

The reference registers this command (mash.cpp:33) but windowed sketching
is compiled out unless ``COMMAND_FIND`` is defined
(sketchParameterSetup.cpp:20-24), so default builds cannot produce the
``.msw`` inputs it needs.  We mirror that default-build behavior: the
command exists, parses its options, and reports that windowed sketching is
not enabled unless given an actual windowed sketch (one with loci).
"""

from __future__ import annotations

import sys

from fpmash_tpu.models.sketch import Sketch


def add_parser(sub):
    p = sub.add_parser("find", help="Find regions of references that match query sequences (windowed sketches).")
    p.add_argument("reference", metavar="<reference>.msw")
    p.add_argument("queries", nargs="+", metavar="<query>")
    p.add_argument("-t", "--threshold", type=float, default=0.2, help="Threshold. This fraction of the query sequence's min-hashes must appear in a query-sized window of a reference sequence for the region to be reported. [0.2]")
    p.add_argument("-b", "--best", type=int, default=0, help="Best hit count.")
    p.add_argument("-e", "--each", action="store_true", help="Report all regions for each query.")
    p.set_defaults(func=run)
    return p


def run(args) -> int:
    from fpmash_tpu.utils.msh import read_msh

    try:
        m = read_msh(args.reference)
    except Exception as e:
        print(f"ERROR: could not read {args.reference}: {e}", file=sys.stderr)
        return 1
    if not m.loci:
        print(
            "ERROR: windowed sketches (.msw) are required by 'find', but windowed "
            "sketching is not enabled in this build (matching the reference's "
            "default build, which gates it behind COMMAND_FIND).",
            file=sys.stderr,
        )
        return 1
    print("ERROR: windowed region search is not implemented yet.", file=sys.stderr)
    return 1
