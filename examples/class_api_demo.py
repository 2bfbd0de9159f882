"""Class-based registration walkthrough — the reference quickstart
shape (featureform's README/docs lead with exactly this API).

Run: python examples/class_api_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import embeddinghub_tpu.featurestore as ff

client = ff.Client()
reg = client.registrar
reg.register_user("demo")
reg.set_default_owner("demo")
reg.register_sqlite_offline("warehouse")
redis = reg.register_memory_online("cache")

transactions = reg.register_primary_data(
    "transactions",
    provider="warehouse",
    location={
        "rows": [
            {"CustomerID": "C1", "TransactionAmount": 5.0, "IsFraud": 0, "Timestamp": 1},
            {"CustomerID": "C1", "TransactionAmount": 500.0, "IsFraud": 1, "Timestamp": 2},
            {"CustomerID": "C2", "TransactionAmount": 7.5, "IsFraud": 0, "Timestamp": 1},
        ]
    },
)


@reg.sql_transformation(name="avg_transactions", provider="warehouse",
                        inputs=[("transactions", "default")])
def avg_transactions():
    return ("SELECT CustomerID, AVG(TransactionAmount) AS avg_amount "
            "FROM {{ transactions.default }} GROUP BY CustomerID")


@ff.entity
class Customer:
    # column selection: [entity column, value column, optional timestamp]
    avg_transaction = ff.Feature(
        avg_transactions[["CustomerID", "avg_amount"]],
        type=ff.Float32,
        inference_store=redis,
    )
    last_amount = ff.Feature(
        transactions[["CustomerID", "TransactionAmount", "Timestamp"]],
        type=ff.Float32,
        inference_store=redis,
    )
    fraudulent = ff.Label(
        transactions[["CustomerID", "IsFraud", "Timestamp"]], type=ff.Bool,
    )


reg.register_training_set(
    "fraud_model",
    label=("fraudulent", "default"),
    features=[
        ("avg_transaction", "default"),
        ("last_amount", "default"),
        # lagged column: the same feature as of (label ts - 1s)
        {"feature": "last_amount", "lag": 1, "name": "prev_amount"},
    ],
)

client.apply()

print("online:", client.features(
    ["avg_transaction", "last_amount"], {"customer": "C1"}))
print("training set:")
print(client.training_set("fraud_model").dataframe())
