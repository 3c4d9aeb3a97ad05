"""Rule programs: named factories the pipeline can ship to actors.

Programs are referenced BY NAME across process boundaries (actor
constructor args are the factory name, not the compiled object), so an
actor compiles its own program once in ``__init__`` — cheap broadcast of
small immutable state (SURVEY.md P2).
"""

from ..ruledsl import load_program
from .heuristic_content import heuristic_content_program
from .main_content import main_content_program
from .mods_to_tei import mods_to_tei_program
from .wikipedia_table import wikitable_program

PROGRAMS = {
    "main_content": main_content_program,
    "wikipedia_table": wikitable_program,
    "mods_to_tei": mods_to_tei_program,
    "heuristic_content": heuristic_content_program,
}


def get_program_factory(name: str):
    """Resolve a program reference to a zero-arg compile factory.

    ``name`` is either a registered program name or an inline JSON
    program spec (starts with ``{`` — the declarative format of
    :mod:`rayxt.ruledsl`).  Either way the reference is a small string
    that ships to every actor by value; the actor compiles its own
    program once in ``__init__``.
    """
    if name.lstrip().startswith("{"):
        # NOTE: load_program is a module-level import for the same
        # reason as the NOTE in ExtractDocs.__init__ — a lazy re-import
        # inside a worker would build a second copy of the class
        # hierarchy and break the kernel's isinstance checks.
        def _compile_spec(spec=name):
            return load_program(spec)

        return _compile_spec
    try:
        return PROGRAMS[name]
    except KeyError:
        raise KeyError(
            f"unknown program {name!r}; known: {sorted(PROGRAMS)} "
            "or an inline JSON program spec"
        ) from None
