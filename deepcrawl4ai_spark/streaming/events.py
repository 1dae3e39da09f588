"""WS-analog liveness surface (reference job.py:107-131 ``/ws/events`` +
tests/test_websocket.py): a pull-based event iterator over the checkpoint
store's committed rounds.

Contract ported from the reference's assertions:
- the FIRST frame on subscribe is the server greeting containing
  "server event" (the accept-time send, job.py:120);
- the subscription stays alive with heartbeat frames while no new commit
  arrives (the keep-alive the reference test holds open for 120 s);
- round commits stream as state-transition events in round order;
- a consumer disconnecting (abandoning the iterator) has NO side effects —
  the feed is a read-only view of the append-only snapshot manifests, so any
  number of subscribers see the same events (the reference's
  _socket_client set broadcast, job.py:111).

Polls are a logical clock (no wall-time sleeps) so tests and replays are
deterministic; a serving layer maps one poll to its tick interval.
"""

from __future__ import annotations

from collections.abc import Iterator

from deepcrawl4ai_spark.frontier.checkpoint import CheckpointStore

GREETING = "Hello, this is a server event!"


def event_stream(
    store: CheckpointStore,
    from_round: int | None = None,
    max_polls: int = 10,
    heartbeat_every: int = 1,
) -> Iterator[dict]:
    """Yield liveness events for *store*'s crawl.

    - ``{"event": "hello", ...}`` first, always.
    - ``{"event": "round_committed", "round": r, "state": ..., metrics…}``
      for every committed round with round > *from_round* (None = all),
      in round order, as they appear.
    - ``{"event": "heartbeat", "poll": n}`` after every *heartbeat_every*
      consecutive polls that found no new commit.
    Ends after *max_polls* data-less polls (a server wraps this generator
    and keeps polling forever; the bound keeps tests finite).
    """
    yield {"event": "hello", "message": GREETING}
    cursor = -2 if from_round is None else from_round  # seed round is -1
    idle = 0
    polls = 0
    while polls < max_polls:
        polls += 1
        fresh = [
            m
            for m in store.round_metrics()
            if m.get("round", -2) > cursor
        ]
        if fresh:
            idle = 0
            for m in sorted(fresh, key=lambda m: m["round"]):
                cursor = m["round"]
                yield {
                    "event": "round_committed",
                    "round": m["round"],
                    "state": m.get("state", "committed"),
                    "urls_fetched": m.get("urls_fetched", 0),
                    "new_frontier": m.get("new_frontier", 0),
                }
        else:
            idle += 1
            if idle % heartbeat_every == 0:
                yield {"event": "heartbeat", "poll": polls}
