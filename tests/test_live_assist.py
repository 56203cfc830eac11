"""Sprite-map sanity for the BGA live assistant (no selenium needed)."""

from alphazero_tpu.cli import live_assist as L
from alphazero_tpu.games.splendor import board_dsl as D


def test_sprite_cards_cover_deck_exactly():
    ids = [D.lookup_card(code) for code in L.CARDS_BY_SPRITE.values()]
    assert len(ids) == 90 and len(set(ids)) == 90
    # sprite sheet order: tiers 1..3 in W,B,G,R,K blocks
    assert L.CARDS_BY_SPRITE["card_1"].startswith("W")
    assert all(L.CARDS_BY_SPRITE[f"card_{n}"][1:] in
               ("7", "73", "633", "5333") for n in range(71, 91))


def test_sprite_nobles_cover_all():
    ids = {D.lookup_noble(code) for code in L.NOBLES_BY_SPRITE.values()}
    assert ids == set(range(10))
