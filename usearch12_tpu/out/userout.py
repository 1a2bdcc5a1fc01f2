"""-userout selectable-field output (src/userout.cpp, src/userfields.h).

Supports the commonly used fields; unknown fields raise.
"""

from __future__ import annotations

from ..config import options

_FIELD_FNS = {}


def _field(name):
    def deco(fn):
        _FIELD_FNS[name] = fn
        return fn
    return deco


@_field("query")
def _query(ar):
    return ar.query_label


@_field("target")
def _target(ar):
    return ar.target_label


@_field("id")
def _id(ar):
    return f"{ar.get_pct_id():.1f}"


@_field("alnlen")
def _alnlen(ar):
    return str(ar.get_aln_length())


@_field("mism")
def _mism(ar):
    return str(ar.get_mismatch_count())


@_field("opens")
def _opens(ar):
    return str(ar.get_gap_open_count())


@_field("qlo")
def _qlo(ar):
    return str(ar.q_coords_1()[0])


@_field("qhi")
def _qhi(ar):
    return str(ar.q_coords_1()[1])


@_field("tlo")
def _tlo(ar):
    return str(ar.t_coords_1()[0])


@_field("thi")
def _thi(ar):
    return str(ar.t_coords_1()[1])


@_field("ql")
def _ql(ar):
    return str(ar.la)


@_field("tl")
def _tl(ar):
    return str(ar.lb)


@_field("qs")
def _qs(ar):
    return str(ar.la)


@_field("ts")
def _ts(ar):
    return str(ar.lb)


@_field("diffs")
def _diffs(ar):
    return str(ar.get_diff_count())


@_field("gaps")
def _gaps(ar):
    return str(ar.get_gap_count())


@_field("caln")
def _caln(ar):
    return ar.compressed_path()


@_field("qstrand")
def _qstrand(ar):
    if not ar.nucleo:
        return "."
    return "-" if ar.query_revcomp else "+"


@_field("qcov")
def _qcov(ar):
    ar._fill()
    return f"{100.0 * (ar.id_count + ar.mismatch_count) / ar.la:.1f}"


@_field("tcov")
def _tcov(ar):
    ar._fill()
    return f"{100.0 * (ar.id_count + ar.mismatch_count) / ar.lb:.1f}"


def user_out_lines(ar) -> str:
    fields = options().str("userfields").split("+")
    vals = []
    for f in fields:
        fn = _FIELD_FNS.get(f)
        if fn is None:
            raise SystemExit(f"Unknown userfield '{f}'")
        vals.append(fn(ar))
    return "\t".join(vals) + "\n"
