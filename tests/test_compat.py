"""Reference-API façade (core/compat.py): ports of the reference's worker
flow specs (spec/map_reduce/mapper_spec.rb, reducer_spec.rb) against the
two-class Mapper/Reducer surface."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from map_reduce_ruby_spark.core import HashPartitioner, InvalidChunkLimit, Mapper, Reducer


def _word_count():
    # Defined per-call (not module top-level) so cloudpickle serializes the
    # class by VALUE — executors cannot import the tests package.
    class WordCount:
        def map(self, text):
            for w in text.split():
                yield w, 1

        def reduce(self, key, a, b):
            return a + b

    return WordCount()


def _no_reduce():
    class NoReduce:
        def map(self, text):
            for w in text.split():
                yield w, 1

    return NoReduce()


def test_end_to_end_worker_flow(spark, tmp_path):
    """The full README worker loop: map -> shuffle -> (files) -> add_chunk ->
    reduce, reference README.md:55-91."""
    mapper = Mapper(_word_count(), spark, partitioner=HashPartitioner(4))
    mapper.map("the quick brown fox")
    mapper.map("the lazy dog")
    mapper.map("the quick dog")

    partitions = mapper.shuffle(out_dir=str(tmp_path / "shuffle"))
    assert partitions, "expected non-empty partitions"
    assert set(partitions) <= set(range(4))

    # "download" every partition chunk into one reducer (single worker)
    reducer = Reducer(_word_count(), spark)
    for pid, path in sorted(partitions.items()):
        dest = reducer.add_chunk()
        shutil.copyfile(path, dest)

    result = dict(reducer.reduce())
    assert result == {
        "the": 3, "quick": 2, "dog": 2, "brown": 1, "fox": 1, "lazy": 1,
    }


def test_shuffle_block_form_cleans_files(spark, tmp_path):
    mapper = Mapper(_word_count(), spark)
    mapper.map("a b a")
    seen: dict[int, str] = {}
    ret = mapper.shuffle(block=lambda parts: seen.update(parts),
                         out_dir=str(tmp_path / "s2"))
    assert ret is None and seen
    for path in seen.values():  # yield-then-cleanup, mapper.rb:88-93
        assert not os.path.exists(path)


def test_chunk_files_are_reference_format(spark, tmp_path):
    """json([key, value]) per line, key-sorted (mapper.rb:115,131-135)."""
    mapper = Mapper(_word_count(), spark, partitioner=lambda k: 0)
    mapper.map("b a c a")
    parts = mapper.shuffle(out_dir=str(tmp_path / "fmt"))
    [path] = parts.values()
    lines = [json.loads(l) for l in open(path)]
    assert lines == [["a", 2], ["b", 1], ["c", 1]]


def test_partition_assignment_matches_partitioner(spark, tmp_path):
    part = HashPartitioner(4)
    mapper = Mapper(_no_reduce(), spark, partitioner=part)
    mapper.map("alpha beta gamma delta epsilon")
    parts = mapper.shuffle(out_dir=str(tmp_path / "pa"))
    for pid, path in parts.items():
        for line in open(path):
            key, _ = json.loads(line)
            assert part(key) == pid


def test_no_reduce_mapper_preserves_duplicates(spark, tmp_path):
    """O16 passthrough (spec/map_reduce/mapper_spec.rb:89-125)."""
    mapper = Mapper(_no_reduce(), spark, partitioner=lambda k: 0)
    mapper.map("x y x")
    [path] = mapper.shuffle(out_dir=str(tmp_path / "nr")).values()
    lines = [json.loads(l) for l in open(path)]
    assert lines == [["x", 1], ["x", 1], ["y", 1]]


def test_no_reduce_shuffle_is_fifo_stable_by_default(spark, tmp_path):
    """Full port of spec/map_reduce/mapper_spec.rb:89-125 ("only sorts, but
    does not reduce ... when there is no reduce implementation"), with the
    duplicate keys given DISTINGUISHABLE values so the assertion actually
    pins duplicate ORDER: the reference's merge is FIFO-stable for equal
    keys (lib/map_reduce/priority_queue.rb:35,50-53), and the façade's
    no-reduce path now defaults stable=True to match byte-for-byte."""

    def _impl():
        class SortOnly:
            def map(self, _input):
                yield ["key3", 1], {"value": 1}
                yield ["key3", 3], {"value": 1}
                yield ["key1", 1], {"value": "first"}
                yield ["key2", 1], {"value": 1}
                yield ["key1", 1], {"value": "second"}
                yield ["key3", 11], {"value": 1}
                yield ["key3", 2], {"value": 1}

        return SortOnly()

    mapper = Mapper(_impl(), spark, partitioner=HashPartitioner(2))
    mapper.map("key")
    parts = mapper.shuffle(out_dir=str(tmp_path / "fifo"))
    result = {
        pid: [json.loads(l) for l in open(path)] for pid, path in parts.items()
    }
    # Same partition split as the reference spec (SHA1 placement), keys
    # numerically sorted (["key3",2] < ["key3",11]), and the two ["key1",1]
    # duplicates in yield order — "first" before "second".
    assert result == {
        0: [
            [["key1", 1], {"value": "first"}],
            [["key1", 1], {"value": "second"}],
            [["key2", 1], {"value": 1}],
            [["key3", 3], {"value": 1}],
            [["key3", 11], {"value": 1}],
        ],
        1: [
            [["key3", 1], {"value": 1}],
            [["key3", 2], {"value": 1}],
        ],
    }


def test_no_reduce_fifo_order_across_many_inputs(spark, tmp_path):
    """Duplicate order follows INPUT order across map() calls, not just
    within one call: seq = (input index, intra-input yield order)."""

    def _impl():
        class Dups:
            def map(self, i):
                yield "k", f"v{i}a"
                yield "k", f"v{i}b"

        return Dups()

    mapper = Mapper(_impl(), spark, partitioner=lambda k: 0)
    for i in range(5):
        mapper.map(i)
    [path] = mapper.shuffle(out_dir=str(tmp_path / "fifo2")).values()
    values = [json.loads(l)[1] for l in open(path)]
    assert values == [f"v{i}{s}" for i in range(5) for s in ("a", "b")]


def test_reducer_distinct_keys_need_no_reduce(spark):
    """spec/map_reduce/reducer_spec.rb:37-62."""
    reducer = Reducer(_no_reduce(), spark)
    with open(reducer.add_chunk(), "w") as f:
        f.write('["a",1]\n["b",2]\n')
    with open(reducer.add_chunk(), "w") as f:
        f.write('["c",3]\n')
    assert dict(reducer.reduce()) == {"a": 1, "b": 2, "c": 3}


def test_reducer_duplicate_keys_without_reduce_raise_lazily(spark):
    reducer = Reducer(_no_reduce(), spark)
    with open(reducer.add_chunk(), "w") as f:
        f.write('["a",1]\n')
    with open(reducer.add_chunk(), "w") as f:
        f.write('["a",2]\n')
    with pytest.raises(AttributeError, match="reduce"):
        list(reducer.reduce())


def test_reducer_output_key_sorted(spark):
    """Merge-only output globally sorted (reducer_spec.rb:64-97)."""
    reducer = Reducer(_word_count(), spark)
    with open(reducer.add_chunk(), "w") as f:
        f.write('["c",1]\n["a",1]\n')
    with open(reducer.add_chunk(), "w") as f:
        f.write('["b",1]\n["a",1]\n')
    keys = [k for k, _ in reducer.reduce()]
    assert keys == ["a", "b", "c"]


def test_reducer_cleans_chunks_even_on_error(spark):
    reducer = Reducer(_no_reduce(), spark)
    p1 = reducer.add_chunk()
    p2 = reducer.add_chunk()
    with open(p1, "w") as f:
        f.write('["k",1]\n')
    with open(p2, "w") as f:
        f.write('["k",2]\n')
    with pytest.raises(AttributeError):
        list(reducer.reduce())
    assert not os.path.exists(p1) and not os.path.exists(p2)


def test_chunk_limit_guards(spark):
    mapper = Mapper(_word_count(), spark)
    mapper.map("a")
    with pytest.raises(InvalidChunkLimit):
        mapper.shuffle(chunk_limit=1)
    reducer = Reducer(_word_count(), spark)
    with pytest.raises(InvalidChunkLimit):
        next(reducer.reduce(chunk_limit=1))


def test_empty_reducer_yields_nothing(spark):
    """reducer_spec.rb:140-142."""
    assert list(Reducer(_word_count(), spark).reduce()) == []


def test_map_is_the_source_connector(spark, tmp_path):
    """The reference's map receives arbitrary inputs (a URL in its README) —
    i.e. the user's map IS the source connector (reference README.md:35-41).
    Here: inputs are file paths; map opens and tokenizes the file."""
    f1, f2 = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    open(f1, "w").write("spark shuffle spark")
    open(f2, "w").write("merge shuffle")

    def _impl():
        class FileWordCount:
            def map(self, path):
                for w in open(path).read().split():
                    yield w, 1

            def reduce(self, key, a, b):
                return a + b

        return FileWordCount()

    mapper = Mapper(_impl(), spark, partitioner=lambda k: 0)
    mapper.map(f1)
    mapper.map(f2)
    [path] = mapper.shuffle(out_dir=str(tmp_path / "out")).values()
    assert [json.loads(l) for l in open(path)] == [
        ["merge", 1], ["shuffle", 2], ["spark", 2],
    ]


def test_map_forwards_full_arg_list(spark, tmp_path):
    """mapper.map(a, b, kw=c) reaches ONE implementation.map(a, b, kw=c)
    call (reference mapper.rb:43 forwards *args/**kwargs)."""

    def _impl():
        class PairImpl:
            def map(self, prefix, text, weight=1):
                for w in text.split():
                    yield f"{prefix}:{w}", weight

            def reduce(self, key, a, b):
                return a + b

        return PairImpl()

    mapper = Mapper(_impl(), spark, partitioner=lambda k: 0)
    mapper.map("en", "a b a", weight=2)
    mapper.map("de", "a")
    [path] = mapper.shuffle(out_dir=str(tmp_path / "args")).values()
    assert [json.loads(l) for l in open(path)] == [
        ["de:a", 1], ["en:a", 4], ["en:b", 2],
    ]


def test_threaded_ingest_is_lossless(spark, tmp_path):
    """O19: many threads feeding ONE mapper concurrently (the reference's
    MonitorMixin contract, mapper.rb:7,45) must lose no input and produce
    the same counts as serial ingest."""
    import threading

    class CountImpl:
        def map(self, word):
            yield word, 1

        def reduce(self, key, a, b):
            return a + b

    mapper = Mapper(CountImpl(), spark, partitioner=lambda k: 0)
    n_threads, per_thread = 8, 250

    def feed(t):
        for i in range(per_thread):
            mapper.map(f"w{i % 10}")

    threads = [threading.Thread(target=feed, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    [path] = mapper.shuffle(out_dir=str(tmp_path / "threaded")).values()
    counts = dict(json.loads(l) for l in open(path))
    assert sum(counts.values()) == n_threads * per_thread
    assert counts == {f"w{i}": n_threads * per_thread // 10 for i in range(10)}


# --------------------------------------------------------- memory_limit spill


def _read_part_bytes(parts: dict[int, str]) -> dict[int, bytes]:
    return {pid: open(path, "rb").read() for pid, path in sorted(parts.items())}


def test_memory_limit_bounds_buffer_and_spills_reference_chunks(spark):
    """The reference's bounded-buffer contract (mapper.rb:21,44-54,123-141):
    feeding far more than memory_limit of pairs keeps the driver buffer
    under the limit at all times and spills sorted, pre-combined
    reference-format chunk files."""
    mapper = Mapper(_word_count(), spark, partitioner=HashPartitioner(4),
                    memory_limit=256)
    max_seen = 0
    for i in range(200):
        mapper.map(f"w{i % 7} w{i % 7} common tail{i}")
        max_seen = max(max_seen, mapper._buffer_size)
    assert max_seen < 256 + 64, "buffer must flush at the JSON-size threshold"
    assert len(mapper._spill_chunks) >= 2, "expected multiple spills"
    for path in mapper._spill_chunks:
        lines = [json.loads(l) for l in open(path)]
        # reference chunk format: [[partition, key], value], sorted by
        # (partition, key), consecutive equal keys combined (reduce impl)
        sort_keys = [(pk[0], pk[1]) for pk, _v in lines]
        assert sort_keys == sorted(sort_keys)
        assert len(set(map(tuple, sort_keys))) == len(sort_keys), \
            "combiner must fold equal keys within a spill chunk"
    # the spill path still produces the right answer end-to-end
    parts = mapper.shuffle()
    counts: dict[str, int] = {}
    for path in parts.values():
        for line in open(path):
            k, v = json.loads(line)
            counts[k] = counts.get(k, 0) + v  # keys unique per file anyway
        os.unlink(path)
    assert counts["common"] == 200
    assert counts["w0"] == 2 * len([i for i in range(200) if i % 7 == 0])
    assert sum(counts.values()) == 200 * 4


def test_memory_limit_output_byte_identical_with_reduce(spark, tmp_path):
    """Partition files from the spill path hash-identical to the unbounded
    path's (the VERDICT r7 'done' criterion)."""
    texts = [f"alpha beta w{i % 13} w{i % 5} gamma" for i in range(120)]

    bounded = Mapper(_word_count(), spark, partitioner=HashPartitioner(8),
                     memory_limit=300)
    unbounded = Mapper(_word_count(), spark, partitioner=HashPartitioner(8))
    for t in texts:
        bounded.map(t)
        unbounded.map(t)
    assert len(bounded._spill_chunks) >= 2
    pb = _read_part_bytes(bounded.shuffle(out_dir=str(tmp_path / "b")))
    pu = _read_part_bytes(unbounded.shuffle(out_dir=str(tmp_path / "u")))
    assert pb == pu


def test_memory_limit_output_byte_identical_no_reduce_fifo(spark, tmp_path):
    """No-reduce spill path: duplicates preserved AND FIFO-stable across
    spill-chunk boundaries — equal keys come out in input order exactly as
    the reference's k-way merge pops them (priority_queue.rb:35,50-53)."""

    def _impl():
        class Dups:
            def map(self, i):
                yield "dup", f"v{i}"
                yield f"solo{i}", i

        return Dups()

    bounded = Mapper(_impl(), spark, partitioner=lambda k: 0,
                     memory_limit=120)
    unbounded = Mapper(_impl(), spark, partitioner=lambda k: 0)
    for i in range(40):
        bounded.map(i)
        unbounded.map(i)
    assert len(bounded._spill_chunks) >= 3
    [pb] = _read_part_bytes(bounded.shuffle(out_dir=str(tmp_path / "b"))).values()
    [pu] = _read_part_bytes(unbounded.shuffle(out_dir=str(tmp_path / "u"))).values()
    assert pb == pu
    dup_vals = [json.loads(l)[1] for l in pb.decode().splitlines()
                if json.loads(l)[0] == "dup"]
    assert dup_vals == [f"v{i}" for i in range(40)]


def test_memory_limit_spill_chunks_cleaned_after_shuffle(spark, tmp_path):
    """The reference deletes spilled chunks in shuffle's ensure
    (mapper.rb:90-93)."""
    mapper = Mapper(_word_count(), spark, partitioner=lambda k: 0,
                    memory_limit=64)
    for i in range(50):
        mapper.map(f"word{i}")
    spilled = list(mapper._spill_chunks)
    assert spilled
    parts = mapper.shuffle(out_dir=str(tmp_path / "clean"))
    for p in spilled:
        assert not os.path.exists(p)
    assert mapper._spill_chunks == [] and mapper._buffer_size == 0
    for path in parts.values():
        os.unlink(path)


def test_memory_limit_threaded_ingest_is_lossless(spark, tmp_path):
    """O19 under the spill path: concurrent map() calls race the buffer and
    the spill trigger; the lock serializes them and no pair is lost."""
    import threading

    class CountImpl:
        def map(self, word):
            yield word, 1

        def reduce(self, key, a, b):
            return a + b

    mapper = Mapper(CountImpl(), spark, partitioner=lambda k: 0,
                    memory_limit=512)
    n_threads, per_thread = 8, 250

    def feed(t):
        for i in range(per_thread):
            mapper.map(f"w{i % 10}")

    threads = [threading.Thread(target=feed, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert mapper._spill_chunks, "expected spills under the tiny limit"
    [path] = mapper.shuffle(out_dir=str(tmp_path / "tspill")).values()
    counts = dict(json.loads(l) for l in open(path))
    assert counts == {f"w{i}": n_threads * per_thread // 10 for i in range(10)}


def test_shuffle_consumes_mapper_state_both_paths(spark, tmp_path):
    """A second shuffle on the same mapper yields EMPTY partitions — the
    reference's shuffle deletes its chunks and the buffer was already
    flushed (mapper.rb:81,88-93), so the state is consumed, not replayed."""
    for ml in (None, 64):
        mapper = Mapper(_word_count(), spark, partitioner=lambda k: 0,
                        memory_limit=ml)
        mapper.map("a b a")
        first = mapper.shuffle(out_dir=str(tmp_path / f"c1_{ml}"))
        assert first, "first shuffle must produce data"
        second = mapper.shuffle(out_dir=str(tmp_path / f"c2_{ml}"))
        assert second == {}, f"memory_limit={ml}: state must be consumed"
        # mapping again after a shuffle works (the reference worker loops)
        mapper.map("c")
        third = mapper.shuffle(out_dir=str(tmp_path / f"c3_{ml}"))
        assert len(third) == 1
        for parts in (first, third):
            for p in parts.values():
                os.unlink(p)


def test_memory_limit_spill_raises_on_incomparable_keys(spark):
    """The spill sort compares keys exactly where the reference's
    write_chunk sort_by does (mapper.rb:126): mixed-type keys forced into
    one partition raise at the spill triggered inside map(), matching the
    reference's ArgumentError timing."""
    import pytest

    from map_reduce_ruby_spark.core.keys import IncomparableKeyError

    class MixedKeys:
        def map(self, _x):
            yield "a" * 40, 1
            yield 1, 1  # number vs string: no Ruby <=> order

    mapper = Mapper(MixedKeys(), spark, partitioner=lambda k: 0,
                    memory_limit=32)
    with pytest.raises(IncomparableKeyError):
        for i in range(10):  # the first over-limit map() call spills
            mapper.map(i)
