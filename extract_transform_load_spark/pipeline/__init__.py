from .parsers import (  # noqa: F401
    EVENT_TYPES,
    parse_lp_deposit,
    parse_lp_withdraw,
    parse_ls_close_position,
    parse_ls_closing,
    parse_ls_liquidation,
    parse_ls_opening,
    parse_ls_repayment,
    parse_tr_profit,
    parse_tr_rewards,
)
