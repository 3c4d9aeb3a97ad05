"""The rule-free text-density heuristic packaged as a rule program.

One simple-step chain (runs once per document, C4): the injected
``root`` goes through :func:`rayxt.boilerplate.main_content_from_root`
and the text lands in the context — so the resumable extraction job,
the CLI, two-tier skew handling and the partitioned sinks all run the
heuristic with zero pipeline changes (``program="heuristic_content"``).
The scoring policy itself is documented and oracle-locked in
:mod:`rayxt.boilerplate`.
"""

from __future__ import annotations

from ..lib import put_variable
from ..rules import Transformation


def heuristic_content_program() -> Transformation:
    from ..boilerplate import main_content_from_root

    def extract_heuristic(root, context):
        text, n_blocks, _status = main_content_from_root(root)
        context.n_blocks = n_blocks
        return text

    return Transformation(
        [extract_heuristic, put_variable("text")],
        copy=False,
        result_object="context",
        name="heuristic_content",
    )
