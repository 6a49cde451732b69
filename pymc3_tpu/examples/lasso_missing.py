"""Lasso regression with missing-predictor imputation (cf.
``pymc3/examples/lasso_missing.py``): Laplace-prior coefficients on test
scores, with masked observations on three predictors spliced in as free
RVs (the imputation path, ``model.py:231-301``). Continuous parameters are
sampled by NUTS and the imputed Bernoulli indicators by
BinaryGibbsMetropolis in one compound step, compiled to a single XLA
program."""
import numpy as np
import pandas as pd
from numpy.ma import masked_values

import pymc3_tpu as pm

# test score, gender, number of siblings, previous disability, age,
# mother with HS education or better, hearing loss identified by 3 months
test_scores = pd.read_csv(pm.get_data("test_scores.csv")).fillna(-999)
(score, male, siblings, disability, age, mother_hs, early_ident) = (
    test_scores[["score", "male", "siblings", "prev_disab", "age_test",
                 "mother_hs", "early_ident"]].astype(float).values.T)


def build_model():
    with pm.Model() as model:
        # impute missing predictors from their marginal models
        sib_mean = pm.Exponential("sib_mean", 1.0)
        siblings_imp = pm.Poisson("siblings_imp", sib_mean,
                                  observed=masked_values(siblings,
                                                         value=-999))

        p_disab = pm.Beta("p_disab", 1.0, 1.0)
        disability_imp = pm.Bernoulli(
            "disability_imp", p_disab,
            observed=masked_values(disability, value=-999))

        p_mother = pm.Beta("p_mother", 1.0, 1.0)
        mother_imp = pm.Bernoulli(
            "mother_imp", p_mother,
            observed=masked_values(mother_hs, value=-999))

        s = pm.HalfCauchy("s", 5.0, testval=5.0)
        beta = pm.Laplace("beta", 0.0, 100.0, shape=7, testval=0.1)

        expected_score = (beta[0] + beta[1] * male + beta[2] * siblings_imp
                          + beta[3] * disability_imp + beta[4] * age
                          + beta[5] * mother_imp + beta[6] * early_ident)
        pm.Normal("observed_score", expected_score, s, observed=score)
    return model


def run(n=1000):
    if n == "short":
        n = 100
    model = build_model()
    with model:
        trace = pm.sample(draws=n, tune=1000, chains=2, progressbar=False)
    print(pm.summary(trace, var_names=["beta", "s", "p_disab", "p_mother",
                                       "sib_mean"]))
    return trace


if __name__ == "__main__":
    run()
