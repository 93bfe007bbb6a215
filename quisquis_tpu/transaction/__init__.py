"""Transaction orchestration (mirrors /root/reference/src/transaction/)."""

from .transaction import (Transaction, Sender, Receiver,  # noqa: F401
                          create_transaction, create_transaction_r1cs,
                          generate_value_and_account_vector)
