"""Human-readable alignment output + fastapairs (minimal)."""

from __future__ import annotations


def fasta_pair(f, ar) -> None:
    """-fastapairs: aligned query/target rows as FASTA (gaps as '-')."""
    ar._fill()
    q_row = []
    t_row = []
    qpos = ar.first_m_qpos
    tpos = ar.first_m_tpos
    q = ar.query_seq
    t = ar.target_seq
    for col in range(ar.first_m_col, ar.last_m_col + 1):
        c = ar.path[col]
        if c in "MD":
            q_row.append(chr(q[qpos]).upper())
            qpos += 1
        else:
            q_row.append("-")
        if c in "MI":
            t_row.append(chr(t[tpos]).upper())
            tpos += 1
        else:
            t_row.append("-")
    f.write(f">{ar.query_label}\n{''.join(q_row)}\n")
    f.write(f">{ar.target_label}\n{''.join(t_row)}\n\n")
