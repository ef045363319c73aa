"""Port of the reference BED validator test cases (reference
``tests/test_bed.py``) against the Spark-native suite in
``bioframe_spark.sources.bed``."""

import pytest
from pyspark.sql import functions as F

from bioframe_spark.sources import bed, fileops

BED12_ROWS = [
    ("chr19", 54331773, 54620705, "feat_1", 1000, ".",
     54331773, 54620705, "0", 2, "14528,19855,", "0,269077,"),
    ("chr19", 54461360, 54620705, "feat_2", 1000, ".",
     54461360, 54620705, "0", 2, "800,19855,", "0,139490,"),
    ("chr5", 131346229, 132145236, "feat_3", 1000, ".",
     131346229, 132145236, "0", 2, "2609,2105,", "0,796902,"),
]
BED12_DDL = (
    "chrom string, start long, end long, name string, score long, "
    "strand string, thickStart long, thickEnd long, itemRgb string, "
    "blockCount long, blockSizes string, blockStarts string"
)


def bed12(spark, **overrides):
    rows = [list(r) for r in BED12_ROWS]
    cols = [c.split()[0] for c in BED12_DDL.split(", ")]
    for col, val in overrides.items():
        rows[0][cols.index(col)] = val
    return spark.createDataFrame([tuple(r) for r in rows], BED12_DDL)


def test_involution(spark, tmp_path):
    df = bed12(spark)
    out = str(tmp_path / "b12")
    bed.to_bed(df, out, schema="bed12")
    back = fileops.read_table(out, schema="bed12")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_chrom_validators(spark):
    for badval in ["value with space", "", "a" * 300]:
        with pytest.raises(ValueError):
            bed.to_bed_dataframe(bed12(spark, chrom=badval))


def test_end_validators(spark):
    with pytest.raises(ValueError):
        bed.to_bed_dataframe(bed12(spark, start=11, end=10))


def test_name_validators(spark):
    for badval in ["", "a" * 300]:
        with pytest.raises(ValueError):
            bed.to_bed_dataframe(bed12(spark, name=badval))


def test_score_validators(spark):
    with pytest.raises(ValueError):
        bed.to_bed_dataframe(bed12(spark, score=1001), strict_score=True)
    # string-typed score column → TypeError even without strict_score
    df = bed12(spark).withColumn("score", F.lit("."))
    with pytest.raises(TypeError):
        bed.to_bed_dataframe(df)


def test_strand_validators(spark):
    with pytest.raises(ValueError):
        bed.to_bed_dataframe(bed12(spark, strand="*"))


def test_thick_validators(spark):
    for col in ["thickStart", "thickEnd"]:
        for badval in [1001, 99]:
            df = bed12(spark, start=100, end=1000, **{col: badval})
            with pytest.raises(ValueError):
                bed.to_bed_dataframe(df)


def test_itemRgb_validators(spark):
    for badval in ["a,12,13", "12,13", "12,13,14,15", "12,13,300", "300"]:
        with pytest.raises(ValueError):
            bed.to_bed_dataframe(bed12(spark, itemRgb=badval))
    # valid forms pass
    bed.to_bed_dataframe(bed12(spark, itemRgb="0"))
    bed.to_bed_dataframe(bed12(spark, itemRgb="12,13,14"))


def test_blockCount_validators(spark):
    with pytest.raises(ValueError):
        bed.to_bed_dataframe(bed12(spark, blockCount=0))


def test_blockSizes_validators(spark):
    with pytest.raises(ValueError):
        bed.to_bed_dataframe(bed12(spark, blockCount=2, blockSizes="2,a,"))
    with pytest.raises(ValueError):
        bed.to_bed_dataframe(bed12(spark, blockCount=2, blockSizes="2,2,2,"))


def test_blockStarts_validators(spark):
    thick = dict(thickStart=1, thickEnd=10)
    cases = [
        # non-integer token
        (dict(blockCount=2, blockSizes="2,4,", blockStarts="0,a,"),
         "blockStarts.is_pattern_ok"),
        # count mismatch
        (dict(blockCount=2, blockSizes="1,1,", blockStarts="0,2,5,"),
         "blockStarts.is_n_blocks_ok"),
        # last block ends after end
        (dict(start=1, end=10, blockCount=1, blockSizes="100,",
              blockStarts="0,", **thick), "blockStarts.is_last_block_end"),
        # last block ends before end
        (dict(start=1, end=10, blockCount=1, blockSizes="1,",
              blockStarts="0,", **thick), "blockStarts.is_last_block_end"),
        # overlapping blocks
        (dict(start=1, end=10, blockCount=2, blockSizes="5,5,",
              blockStarts="0,1,", **thick), "blockStarts.is_no_overlap"),
    ]
    for overrides, expect_prop in cases:
        df = bed12(spark, **overrides)
        _, _, props_failed = bed.validate_bed_fields(
            df, bed.BED_FIELD_NAMES
        )
        assert expect_prop in props_failed, (overrides, props_failed)
        with pytest.raises(ValueError):
            bed.to_bed_dataframe(df)
    # a valid two-block row passes: blocks [0,2) and [5,9) of a 9-bp feature
    bed.to_bed_dataframe(
        bed12(spark, start=1, end=10, blockCount=2,
              blockSizes="2,4,", blockStarts="0,5,", **thick)
    )


def test_chromsizes_validation(spark):
    ok = bed12(spark)
    bed.to_bed_dataframe(ok, chromsizes={"chr19": 58617616, "chr5": 181538259})
    with pytest.raises(ValueError):
        bed.to_bed_dataframe(ok, chromsizes={"chr19": 1000, "chr5": 181538259})
    # unknown chrom fails (reference NaN-lookup behavior)
    with pytest.raises(ValueError):
        bed.to_bed_dataframe(ok, chromsizes={"chr19": 58617616})


def test_parse_and_infer_schema(spark):
    assert bed.parse_bed_schema("bed9") == (9, False)
    assert bed.parse_bed_schema("bed6+3") == (6, True)
    assert bed.parse_bed_schema("bed+") == (6, True)
    with pytest.raises(ValueError):
        bed.parse_bed_schema("bed13")
    assert bed.infer_bed_schema(bed12(spark)) == (12, False)
    three = bed12(spark).select("chrom", "start", "end", "name")
    assert bed.infer_bed_schema(three) == (4, False)


def test_fill_and_replace_na(spark):
    three = bed12(spark).select("chrom", "start", "end")
    out = bed.to_bed_dataframe(three, schema="bed6")
    assert out.columns == ["chrom", "start", "end", "name", "score", "strand"]
    row = out.orderBy("chrom", "start").first()
    assert (row["name"], row["strand"]) == (".", ".")
    # null in a standard column: replaced under replace_na, raises without
    withnull = bed12(spark).withColumn(
        "name", F.when(F.col("start") == 54331773, None).otherwise(F.col("name"))
    )
    filled = bed.to_bed_dataframe(withnull, replace_na=True)
    assert filled.filter("name = '.'").count() == 1
    with pytest.raises(ValueError):
        bed.to_bed_dataframe(withnull, replace_na=False)


def test_check_is_sorted(spark):
    df = bed12(spark).coalesce(1).sortWithinPartitions("chrom", "start", "end")
    props = bed.check_is_sorted(df)
    assert all(props.values())
    # chroms interleaved across the frame -> not consecutive
    inter = spark.createDataFrame(
        [("chr1", 0, 1), ("chr2", 0, 1), ("chr1", 5, 6)],
        "chrom string, start long, end long",
    ).coalesce(1)
    props = bed.check_is_sorted(inter)
    assert not props["sorted.is_chrom_consecutive"]
    # consecutive chroms in non-lexicographic order are fine
    weird = spark.createDataFrame(
        [("chr2", 0, 1), ("chr1", 0, 1), ("chr1", 5, 6)],
        "chrom string, start long, end long",
    ).coalesce(1)
    props = bed.check_is_sorted(weird)
    assert props["sorted.is_chrom_consecutive"]
    assert props["sorted.is_sorted_start_end"]
    # start out of order within a chrom
    bad = spark.createDataFrame(
        [("chr1", 5, 6), ("chr1", 0, 1)], "chrom string, start long, end long"
    ).coalesce(1)
    assert not bed.check_is_sorted(bad)["sorted.is_sorted_start_end"]


def test_require_sorted(spark):
    bad = spark.createDataFrame(
        [("chr1", 5, 6), ("chr1", 0, 1)], BED12_DDL.split(", name")[0]
    ).coalesce(1)
    with pytest.raises(ValueError, match="sorted"):
        bed.to_bed_dataframe(bad, require_sorted=True)
