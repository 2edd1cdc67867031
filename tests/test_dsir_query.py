"""dsir_report extras-surface query: runs at sf0.001, selection skews
hard toward the target language, output deterministic."""

from cerberus_ray.pipelines.training_queries import q_dsir_report

SF = "/root/testdata/sf0.001"


def test_dsir_report_targets_german(ray_session):
    out = q_dsir_report(SF).to_pandas().set_index("lang")
    assert int(out["n_selected"].sum()) == 50
    # near-zero temperature + a German target ⇒ 'de' dominates even
    # though it is a minority language (71/500) in the raw corpus
    assert int(out.loc["de", "n_selected"]) >= 40


def test_dsir_report_deterministic(ray_session):
    a = q_dsir_report(SF).to_pandas()
    b = q_dsir_report(SF).to_pandas()
    assert a.equals(b)
