"""Per-row transforms (SURVEY §2.2 P1–P16) as column expressions.

The reference implements every one of these as an opaque map-UDF; here they
are Catalyst expressions, so pushdown/pruning/codegen apply across them
(SURVEY §4.1's core argument). Pandas UDFs appear only in the multimodal
decode path (``plumberapp_spark.llm.multimodal``).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pad_to_length(col: Column, length: int, pad_value: object) -> Column:
    """P13 ``tf.pad`` / ``pad_up_to`` — right-pad an array to ``length``
    (and trim if longer: ``trim_and_pad``, ``mb/simple_ssd/dataloader.py:451-457``).

    Reference: ``mb/simple_gnmt/utils/iterator_utils.py:170-190``;
    ``mb/simple_transformer/transformer.py:100-104``.
    """
    padded = F.concat(col, F.array_repeat(F.lit(pad_value), length))
    return F.slice(padded, 1, length)


def add_sos_eos(col: Column, sos_id: int, eos_id: int) -> Column:
    """P12 sequence assembly ``concat(([sos], src, [eos]), 0)``.

    Reference: ``mb/simple_gnmt/utils/iterator_utils.py:157-166``.
    """
    return F.concat(F.array(F.lit(sos_id)), col, F.array(F.lit(eos_id)))


def string_split(col: Column, delimiter: str = " ") -> Column:
    """P9 ``tf.string_split``. Reference: ``iterator_utils.py:64-66``."""
    return F.split(col, delimiter)


def truncate_seq(col: Column, max_len: int) -> Column:
    """P9 python-slice truncation ``src[:max_len]``.

    Reference: ``iterator_utils.py:79-85``.
    """
    return F.slice(col, 1, max_len)


def string_to_number(col: Column, out_type: str = "int") -> Column:
    """P10 ``tf.string_to_number``. Reference: ``mb/simple_ssd/dataloader.py:464``."""
    return col.cast(out_type)


def hash_bucket(col: Column, num_buckets: int) -> Column:
    """P10 ``tf.strings.to_hash_bucket_fast`` — declared as modulo-hash
    semantics, not bit-identical to TF's Fingerprint64 (SURVEY §2.2 P10).

    Portable across engines: first 8 hex chars of md5 -> int -> mod. DuckDB
    oracle: ``('0x' || substr(md5(col),1,8))::BIGINT % n``.
    """
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % num_buckets).cast("bigint")


def vocab_lookup(
    tokens: DataFrame,
    vocab: DataFrame,
    token_col: str = "token",
    id_col: str = "id",
    default_id: int = 0,
    out_col: str = "token_id",
) -> DataFrame:
    """P11/J4 vocab table lookup with default — the engine's one true join,
    done as a broadcast hash join (vocab is small by construction).

    Reference: ``mb/simple_gnmt/utils/iterator_utils.py:50-53,90-145``.
    """
    joined = tokens.join(F.broadcast(vocab), on=token_col, how="left")
    return joined.withColumn(out_col, F.coalesce(F.col(id_col), F.lit(default_id))).drop(id_col)


def conditional(pred: Column, if_true: Column, if_false: Column) -> Column:
    """P8 ``tf.cond`` per-row conditional (padding-sentinel handling).

    Reference: ``mb/simple_resnet/MLPerf/imagenet_input.py:86-87``.
    """
    return F.when(pred, if_true).otherwise(if_false)


def class_remap(col: Column, mapping: Mapping[int, int], default: int = 0) -> Column:
    """P14 ``tf.gather(class_map, classes)`` — remap each element of an
    int-array column through a small lookup (80-of-90 COCO classes).

    Reference: ``mb/simple_ssd/dataloader.py:403-406``.
    """
    map_lit = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return F.transform(col, lambda c: F.coalesce(map_lit[c], F.lit(default)))


def count_matched(col: Column, sentinel: int = -1) -> Column:
    """P15 per-row aggregate ``reduce_sum(cast(ne(matches, -1)))``.

    Reference: ``mb/simple_ssd/dataloader.py:295-296``.
    """
    return F.size(F.filter(col, lambda x: x != sentinel))


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """P16 dict-wise cast. Reference: ``mb/simple_transformer/transformer.py:116-117``."""
    out = df
    for name, dtype in casts.items():
        out = out.withColumn(name, F.col(name).cast(dtype))
    return out


def parse_example(df: DataFrame, features: Sequence[str]) -> DataFrame:
    """P3/P4 TFExample parse — in the parquet-first data model records are
    already columnar, so parsing IS projection (and Catalyst prunes the
    scan down to these columns: check ``ReadSchema`` in ``.explain``).

    Reference: ``mb/simple_resnet/MLPerf/imagenet_input.py:42-46``;
    ``mb/simple_ssd/object_detection/tf_example_decoder.py:36-77``.
    """
    return df.select(*features)


def transpose_layout(col: Column, shape: Sequence[int], perm: Sequence[int]) -> Column:
    """P7 layout transform (``tf.transpose`` to HWCN/HWNC,
    ``mb/simple_resnet/MLPerf/imagenet_input.py:122-132``; fused variant
    ``mb/simple_ssd/dataloader.py:323-371``): permute the axes of a
    row-major-flattened tensor stored as a flat array column.

    Pure JVM-side index arithmetic — ``out[i] = in[old_index(i)]`` over a
    ``sequence`` of positions; no UDF, no shuffle. ``shape`` is the input
    shape, ``perm`` the axis permutation (both small Python constants, so
    the index expression constant-folds)."""
    n = 1
    for d in shape:
        n *= d
    out_shape = [shape[p] for p in perm]
    # strides of the input, row-major
    in_strides = [1] * len(shape)
    for i in range(len(shape) - 2, -1, -1):
        in_strides[i] = in_strides[i + 1] * shape[i + 1]

    def old_index(i: Column) -> Column:
        # decompose output position into out_shape coords, re-linearize
        # through the permuted input strides
        rem = i
        idx = F.lit(0)
        for axis in range(len(out_shape)):
            stride_out = 1
            for d in out_shape[axis + 1 :]:
                stride_out *= d
            coord = (rem / stride_out).cast("int")
            rem = rem % stride_out
            idx = idx + coord * F.lit(in_strides[perm[axis]])
        return idx

    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)), lambda i: F.element_at(col, old_index(i) + 1)
    )


def restructure(df: DataFrame, schema) -> DataFrame:
    """O12 ``RestructuredDataset`` (``pa/annotations.py:56-63``): re-assert
    an element spec over the stream — column order + dtypes forced to
    ``schema`` (a StructType). Pure projection; fails analysis if a column
    is missing, exactly like the reference's spec patch."""
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
