"""Protocol-level coverage for the Java-subprocess metric wrappers (METEOR,
SPICE) with stub processes implementing the jars' recorded stdio/file
contracts, plus a differential PTB-tokenizer corpus test against
hand-recorded Stanford PTBTokenizer outputs.

The real jars are git-lfs blobs missing from the reference mount (and java
is absent here), so these tests pin OUR side of each protocol: exact line
formats, ordering, temp-file layout, and output parsing."""

import json
import os

import numpy as np
import pytest

from sparse_caption_tpu.metrics import meteor as meteor_mod
from sparse_caption_tpu.metrics import spice as spice_mod
from sparse_caption_tpu.metrics.ptb_tokenizer import ptb_tokenize, ptb_tokenize_sentence


# ------------------------------------------------------------------- METEOR
class _FakeMeteorProc:
    """Implements the meteor-1.5.jar stdio protocol
    (reference meteor/meteor.py:16-59): each ``SCORE ||| refs... ||| hyp``
    line yields one stats line; one ``EVAL ||| stats...`` line yields a
    score line per segment then the final aggregate."""

    def __init__(self):
        self.score_lines = []
        self._out = []
        self.stdin = self
        self.stdout = self

    # stdin interface
    def write(self, line):
        line = line.rstrip("\n")
        if line.startswith("SCORE"):
            self.score_lines.append(line)
            self._out.append(f"stat_{len(self.score_lines) - 1}")
        elif line.startswith("EVAL"):
            stats = line.split(" ||| ")[1:]
            assert stats == [f"stat_{i}" for i in range(len(self.score_lines))], \
                "EVAL must echo the SCORE stats in order"
            self._out += [f"0.{i + 1}" for i in range(len(stats))]
            self._out.append("0.99")  # final aggregate

    # stdout interface
    def readline(self):
        return self._out.pop(0) + "\n"

    def close(self):
        pass

    def kill(self):
        pass

    def wait(self):
        pass


def test_meteor_protocol(monkeypatch, tmp_path):
    jar = tmp_path / "meteor-1.5.jar"
    jar.write_bytes(b"stub")
    monkeypatch.setenv(meteor_mod.JAR_ENV, str(jar))
    monkeypatch.setattr(meteor_mod, "is_available", lambda: True)
    fake = _FakeMeteorProc()
    captured_cmd = {}

    def fake_popen(cmd, **kw):
        captured_cmd["cmd"] = cmd
        return fake

    monkeypatch.setattr(meteor_mod.subprocess, "Popen", fake_popen)

    m = meteor_mod.Meteor()
    assert captured_cmd["cmd"][0] == "java"
    assert captured_cmd["cmd"][-4:] == ["-stdio", "-l", "en", "-norm"]

    gts = {2: ["a dog on a couch", "the dog sits"], 1: ["a man riding ||| a horse"]}
    res = {2: ["a dog sitting"], 1: ["a man ||| rides"]}
    final, scores = m.compute_score(gts, res)

    # segments went through in sorted-id order, refs joined before the hyp
    # the hyp's "|||" is stripped and the doubled space collapsed
    # (reference meteor.py:52-55)
    assert fake.score_lines[0] == "SCORE ||| a man riding ||| a horse ||| a man rides"
    assert fake.score_lines[1] == "SCORE ||| a dog on a couch ||| the dog sits ||| a dog sitting"
    assert scores == [0.1, 0.2]
    assert final == 0.99


# -------------------------------------------------------------------- SPICE
def test_spice_protocol(monkeypatch, tmp_path):
    jar = tmp_path / "spice-1.0.jar"
    jar.write_bytes(b"stub")
    monkeypatch.setenv(spice_mod.JAR_ENV, str(jar))
    monkeypatch.setattr(spice_mod, "is_available", lambda: True)
    seen = {}

    def fake_check_call(cmd, cwd=None):
        seen["cmd"], seen["cwd"] = cmd, cwd
        in_file = cmd[cmd.index("-cache") - 1]
        out_file = cmd[cmd.index("-out") + 1]
        assert "-subset" in cmd and "-silent" in cmd
        with open(in_file) as f:
            data = json.load(f)
        seen["input"] = data
        results = []
        for i, item in enumerate(data):
            assert set(item) == {"image_id", "test", "refs"}
            f_score = float("nan") if i == 0 else 0.25 * i
            results.append({"image_id": item["image_id"], "scores": {"All": {"f": f_score}}})
        with open(out_file, "w") as f:
            json.dump(results, f)
        return 0

    monkeypatch.setattr(spice_mod.subprocess, "check_call", fake_check_call)

    gts = {5: ["a dog", "the dog"], 3: ["a man"]}
    res = {5: ["dog on couch"], 3: ["a person"]}
    mean, scores = spice_mod.Spice().compute_score(gts, res)

    assert seen["cwd"] == os.path.dirname(str(jar))
    assert [d["image_id"] for d in seen["input"]] == ["3", "5"]  # sorted ids
    assert seen["input"][0] == {"image_id": "3", "test": "a person", "refs": ["a man"]}
    # NaN F-scores map to 0 (reference spice.py:73-76 np.nan_to_num)
    np.testing.assert_allclose(scores, [0.0, 0.25])
    np.testing.assert_allclose(mean, 0.125)


# ------------------------------------------------------- PTB differential
# Raw (non-pre-tokenized) captions with the Stanford CoreNLP PTBTokenizer
# (-preserveLines -lowerCase) output AFTER the PUNCTUATIONS removal of
# reference ptbtokenizer.py:21-39 — the exact pipeline metric inputs see.
STANFORD_CASES = [
    ("A man riding a horse.", "a man riding a horse"),
    ("Two dogs, one cat and a bird!", "two dogs one cat and a bird"),
    ("Don't run; it's wet.", "do n't run it 's wet"),
    ("The man's hat (red) is big.", "the man 's hat -lrb- red -rrb- is big"),
    ("A well-known artist", "a well-known artist"),
    ("Over 2,000 people...", "over 2,000 people"),
    ("It costs $5.50, I think.", "it costs $ 5.50 i think"),
    # Stanford emits "dogs '" and the "'" token is in the removal list
    ("the dogs' toys are new", "the dogs toys are new"),
    ("\"Stop!\" he said.", "stop he said"),
    ("Skiers: downhill -- fast!", "skiers downhill fast"),
    ("We cannot see them.", "we can not see them"),
    ("They're here; we've left.", "they 're here we 've left"),
    ("a black & white photo", "a black & white photo"),
    ("An odd {curly} case", "an odd -lcb- curly -rcb- case"),
    ("I'll go, you'd stay, I'm sure.", "i 'll go you 'd stay i 'm sure"),
    ("a 3.5 inch screen", "a 3.5 inch screen"),
    ("photo of a kitchen   with extra   spaces", "photo of a kitchen with extra spaces"),
    ("A plate of food: meat, rice, and salad.", "a plate of food meat rice and salad"),
    # --- raw-caption (--retokenize_captions) edge cases, round 3 ---
    # the one punctuation-bearing caption in the reference's own fixture
    # (/root/reference/tests/data/dataset_coco_testing.json, "raw" field)
    ("A woman marking a cake with the back of a chef's knife. ",
     "a woman marking a cake with the back of a chef 's knife"),
    # dotted abbreviations stay one token (Stanford keeps t.v. / u.s.)
    ("A man watching t.v. on a couch", "a man watching t.v. on a couch"),
    ("flags of the U.S. and Canada", "flags of the u.s. and canada"),
    # percent splits off its number (Stanford: 25 %)
    ("25% off all hats!", "25 % off all hats"),
    # slash compounds stay one token
    ("a black/white photo of a train", "a black/white photo of a train"),
    ("1 1/2 sandwiches on a plate", "1 1/2 sandwiches on a plate"),
    # unicode quotes/dashes normalize to ASCII PTB forms, then drop
    ("“Stop” he said — loudly…", "stop he said loudly"),
    ("the bird’s nest", "the bird 's nest"),
    # multi-sentence raw captions
    ("A dog runs. A cat sleeps.", "a dog runs a cat sleeps"),
    # possessive who's vs contraction both split the same way
    ("A man who's smiling, and his friend's bike.",
     "a man who 's smiling and his friend 's bike"),
]


@pytest.mark.parametrize("raw,expected", STANFORD_CASES, ids=range(len(STANFORD_CASES)))
def test_ptb_tokenizer_matches_stanford(raw, expected):
    assert " ".join(ptb_tokenize_sentence(raw)) == expected


def test_ptb_tokenize_contract():
    caps = {7: [{"caption": "A dog."}, {"caption": "Two dogs!"}], 2: [{"caption": "Hi, there."}]}
    out = ptb_tokenize(caps)
    assert out == {7: ["a dog", "two dogs"], 2: ["hi there"]}
