"""Plan inspection: capture and assert on physical-plan properties
(pushdown, broadcast, codegen) so scale regressions fail tests, not
production."""
