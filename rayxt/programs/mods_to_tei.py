"""MODS -> TEI-header style document-to-document transformation.

Models the reference's flagship example (SURVEY.md section 3.3): a
namespace-heavy XML transformation exercising namespace conditions,
element creation (elementmaker), handler chaining, ``append``
accumulators and a final tree-building step.

FROZEN SEMANTICS over a MODS-like record
(``{http://www.loc.gov/mods/v3}``):

* every ``mods:title`` text is collected (document order);
* every ``mods:namePart`` under ``mods:name type="personal"`` is
  collected as an author;
* every ``mods:dateIssued`` text is collected;
* the result is a ``tei:teiHeader`` tree
  (``{http://www.tei-c.org/ns/1.0}``)::

      teiHeader/fileDesc/titleStmt/title*        (one per collected title)
      teiHeader/fileDesc/titleStmt/author*       (one per collected author)
      teiHeader/fileDesc/publicationStmt/date?   (first collected date)

  serialized with deterministic ns0.. prefixes by
  :func:`rayxt.dom.serialize` in XML mode.
"""

from __future__ import annotations

from ..dom import new_element, serialize
from ..lib import append, get_text, put_variable
from ..rules import Ref, Rule, Transformation

MODS = "http://www.loc.gov/mods/v3"
TEI = "http://www.tei-c.org/ns/1.0"


def _t(local: str) -> str:
    return "{%s}%s" % (TEI, local)


def _m(local: str) -> str:
    return "{%s}%s" % (MODS, local)


def _in_personal_name(element) -> bool:
    p = element.parent
    return p is not None and p.tag == _m("name") and p.attrs.get("type") == "personal"


def build_tei_header(context):
    title_stmt = new_element(_t("titleStmt"))
    for t in getattr(context, "titles", []):
        title_stmt.append(new_element(_t("title"), text=t))
    for a in getattr(context, "authors", []):
        title_stmt.append(new_element(_t("author"), text=a))
    file_desc = new_element(_t("fileDesc"), None, title_stmt)
    dates = getattr(context, "dates", [])
    if dates:
        file_desc.append(
            new_element(_t("publicationStmt"), None,
                        new_element(_t("date"), text=dates[0]))
        )
    header = new_element(_t("teiHeader"), None, file_desc)
    context.tei = header
    return header


def serialize_tei(context):
    return serialize(context.tei, xml_mode=True)


def mods_to_tei_program() -> Transformation:
    return Transformation(
        Rule(_m("title"), [get_text, append("titles")], name="titles"),
        Rule((_m("namePart"), _in_personal_name), [get_text, append("authors")],
             name="authors"),
        Rule(_m("dateIssued"), [get_text, append("dates")], name="dates"),
        [build_tei_header, serialize_tei, put_variable("tei_xml")],
        copy=False,
        result_object="context.tei_xml",
        name="mods_to_tei",
    )
