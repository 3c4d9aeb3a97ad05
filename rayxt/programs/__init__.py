"""Rule programs: named factories the pipeline can ship to actors.

Programs are referenced BY NAME across process boundaries (actor
constructor args are the factory name, not the compiled object), so an
actor compiles its own program once in ``__init__`` — cheap broadcast of
small immutable state (SURVEY.md P2).
"""

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
    try:
        return PROGRAMS[name]
    except KeyError:
        raise KeyError(f"unknown program {name!r}; known: {sorted(PROGRAMS)}") from None
