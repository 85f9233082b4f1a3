"""survey_consistency placeholder rejection (r13 verdict item 3).

The r13 close shipped a literal ``doc_link_coreness=XX.XXs`` because
``check_perquery_tokens`` only examined tokens its numeric regex
matched; placeholder-shaped seconds values must now be a hard
failure, while the documented form-spec literal ``name=N.NNs`` and
real numeric tokens stay accepted.
"""

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "survey_consistency",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "survey_consistency.py",
    ),
)
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)


def test_placeholder_token_rejected():
    fails = _MOD.check_perquery_tokens(
        "close figures: doc_link_coreness=XX.XXs this close"
    )
    assert any("placeholder" in f for f in fails)


def test_question_mark_placeholder_rejected():
    fails = _MOD.check_perquery_tokens("doc_link_kcore=?.??s measured")
    assert any("placeholder" in f for f in fails)


def test_form_spec_literal_accepted():
    # SURVEY.md legitimately *describes* the token convention as
    # ``name=N.NNs`` — that literal is not a placeholder.
    assert _MOD.check_perquery_tokens("tokens use the name=N.NNs form") == []


def test_real_numeric_token_still_validated():
    # a numeric token for an unknown query still fails (existing
    # behavior), proving the placeholder branch didn't swallow it
    fails = _MOD.check_perquery_tokens("no_such_query_xyz=1.23s")
    assert any("not in" in f for f in fails)
