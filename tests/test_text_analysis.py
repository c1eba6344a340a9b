

def test_unigram_drift_detects_controlled_shift(spark):
    """Even-half docs say 'alpha', odd-half docs say 'omega', both share
    'mid': KL must be large and positive BOTH directions, vocab overlap
    exactly the shared token. Identical halves must read ~0 (the add-1
    smoothed ratio of near-equal counts rounds to a 0-bit difference)."""
    import blockchain_etl_spark.plans.text as text_mod
    from blockchain_etl_spark.plans.text import corpus_unigram_drift

    drifted = spark.createDataFrame(
        [(i, "alpha alpha alpha mid" if i % 2 == 0 else "omega omega omega mid")
         for i in range(200)],
        ["doc_id", "text"],
    )
    same = spark.createDataFrame(
        [(i, "alpha beta gamma mid") for i in range(200)], ["doc_id", "text"]
    )
    orig = text_mod.load_table
    try:
        text_mod.load_table = lambda spark, sf_dir, name: drifted
        got = corpus_unigram_drift(spark, "ignored").collect()[0]
        text_mod.load_table = lambda spark, sf_dir, name: same
        null = corpus_unigram_drift(spark, "ignored").collect()[0]
    finally:
        text_mod.load_table = orig
    assert got.vocab_a == 2 and got.vocab_b == 2 and got.vocab_shared == 1
    # 3/4 of each half's mass sits on a token the other half saw only via
    # smoothing: whole-bit KL must exceed ~3 bits * 0.75 mass = 2250 mb
    assert got.kl_ab_millibits > 2000 and got.kl_ba_millibits > 2000
    assert abs(null.kl_ab_millibits) <= 100 and abs(null.kl_ba_millibits) <= 100
