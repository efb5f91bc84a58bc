"""METEOR 1.5 via the Java line protocol (optional).

Same subprocess contract as the reference
(``coco_caption/pycocoevalcap/meteor/meteor.py:16-59``): a long-lived
``java -jar meteor-1.5.jar - - -stdio -l en -norm`` process driven with
``SCORE ||| ref1 ||| ... ||| hyp`` then ``EVAL ||| stats`` lines.

The jar ships via git-lfs in the reference and is absent here
(``.MISSING_LARGE_BLOBS``), so this scorer is availability-gated: use
``is_available()`` before scoring; the eval driver skips METEOR when the
jar (path via ``SPARSE_CAPTION_METEOR_JAR``) is missing.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import threading
from typing import Dict

JAR_ENV = "SPARSE_CAPTION_METEOR_JAR"


def jar_path() -> str:
    return os.environ.get(JAR_ENV, "")


def is_available() -> bool:
    return bool(jar_path()) and os.path.isfile(jar_path()) and shutil.which("java") is not None


class Meteor:
    def __init__(self):
        if not is_available():
            raise RuntimeError(f"METEOR jar not available (set ${JAR_ENV})")
        self.lock = threading.Lock()
        self.proc = subprocess.Popen(
            ["java", "-jar", "-Xmx2G", jar_path(), "-", "-", "-stdio", "-l", "en", "-norm"],
            cwd=os.path.dirname(os.path.abspath(jar_path())),
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, universal_newlines=True, bufsize=1,
        )

    def compute_score(self, gts: Dict, res: Dict):
        ids = sorted(gts.keys())
        scores = []
        with self.lock:
            eval_line = "EVAL"
            for i in ids:
                stat = self._stat(res[i][0], gts[i])
                eval_line += " ||| {}".format(stat)
            self.proc.stdin.write(eval_line + "\n")
            for _ in ids:
                scores.append(float(self.proc.stdout.readline().strip()))
            final = float(self.proc.stdout.readline().strip())
        return final, scores

    def _stat(self, hypothesis: str, references) -> str:
        hypothesis = hypothesis.replace("|||", "").replace("  ", " ")
        line = " ||| ".join(("SCORE", " ||| ".join(references), hypothesis))
        self.proc.stdin.write(line + "\n")
        return self.proc.stdout.readline().strip()

    def close(self):
        with self.lock:
            if self.proc:
                self.proc.stdin.close()
                self.proc.kill()
                self.proc.wait()
