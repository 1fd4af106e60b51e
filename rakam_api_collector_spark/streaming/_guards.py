"""Shared guard logic for the store-backed stream wrappers
(dedupstream / dsirstream).

The pre-r15 legacy-id hazard, precisely: ingest ids were un-namespaced
(``epoch-N``) before the checkpoint-token namespacing landed. The ONLY
run that can re-ingest one of those partitions' data is a RESUME of
the very checkpoint that wrote them — Structured Streaming replays its
in-flight epoch, and post-upgrade code would land that replay under
the new namespaced id BESIDE the legacy partition, double-counting its
documents. A FRESH checkpoint (new token) restarts epoch numbering at
0, so its epoch ids coincide with legacy partition NUMBERS by
arithmetic, not by lineage — the namespaced id cannot collide and no
replay hazard exists (ADVICE r16: the old number-only guard raised on
exactly this false positive).
"""

from __future__ import annotations

import os
import re


def legacy_replay_ids(store_ids: "set[str]", checkpoint: str,
                      ck_token: str) -> "set[str]":
    """Ids whose epoch numbers this run must refuse to ingest, or the
    empty set when no replay hazard exists. Decision, cheapest first:

    - no ``epoch-N`` legacy ids in the store: nothing to guard;
    - the store already holds ``epoch-{ck_token}-*`` ids: THIS
      checkpoint has committed under post-r15 code before, so its
      replay window has already cleared the legacy era — collisions
      are coincidental;
    - the checkpoint has no PLANNED batches (probed via its
      ``offsets/`` dir — ADVICE r17: Spark writes ``offsets/N``
      BEFORE running batch N and ``commits/N`` only after
      ``foreachBatch`` returns, so a pre-r15 run that ingested epoch
      0 and crashed before its commit marker leaves offsets-but-no-
      commits; a commits-based probe misreads exactly that replayable
      checkpoint as fresh): a truly fresh checkpoint has neither, and
      its epoch numbers restart at 0 with no lineage to the legacy
      partitions;
    - otherwise: a resumed checkpoint with committed progress that
      never wrote a namespaced id — the genuine pre-r15 upgrade
      resume, where the replayed epoch's data IS the legacy
      partition's data. Guard on.

    URI checkpoints can't be probed with ``os`` — stay conservative
    (guard on): a false raise names the remediation, a silent
    double-ingest does not. Pre-r15 checkpoints are POSIX in practice
    (the namespacing shipped before any object-store checkpoint
    support), so the conservative branch is theoretical.

    Known conservative false-arm (the price of the offsets probe): a
    POST-r15-created checkpoint that planned batch 0 and crashed
    before its first store ingest is indistinguishable from the
    pre-r15 upgrade resume (offsets present, no namespaced ids) and
    arms the guard even though its lineage cannot double-count. The
    raise's remediations all apply — renaming the legacy partition
    to the namespaced id is the no-data-loss one here.
    """
    legacy = {i for i in store_ids if re.fullmatch(r"epoch-\d+", i)}
    if not legacy:
        return set()
    if any(i.startswith(f"epoch-{ck_token}-") for i in store_ids):
        return set()
    if "://" not in checkpoint:
        d = os.path.join(checkpoint, "offsets")
        if not (os.path.isdir(d) and os.listdir(d)):
            return set()
    return legacy
