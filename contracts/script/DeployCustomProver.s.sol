// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

/// @notice Whitelist a custom prover for both VectorX function IDs on the
///         SuccinctGateway (same env contract as the reference
///         contracts/script/DeployCustomProver.s.sol:12-39): flip each
///         function to Custom whitelist mode, then register the prover.
/// Env: GATEWAY_ADDRESS, HEADER_RANGE_FUNCTION_ID, ROTATE_FUNCTION_ID,
///      CUSTOM_PROVER.
interface Vm {
    function envAddress(string calldata) external returns (address);
    function envBytes32(string calldata) external returns (bytes32);
    function startBroadcast() external;
    function stopBroadcast() external;
}

/// @dev Gateway admin surface used here (whitelist modes: 0 = Default,
///      1 = Custom, 2 = Disabled).
interface IGatewayWhitelist {
    function setWhitelistStatus(bytes32 functionId, uint8 status) external;
    function addCustomProver(bytes32 functionId, address prover) external;
}

contract DeployCustomProver {
    Vm constant vm = Vm(address(uint160(uint256(keccak256("hevm cheat code")))));

    uint8 constant WHITELIST_CUSTOM = 1;

    function run() external {
        IGatewayWhitelist gateway =
            IGatewayWhitelist(vm.envAddress("GATEWAY_ADDRESS"));
        bytes32 headerRangeFunctionId = vm.envBytes32("HEADER_RANGE_FUNCTION_ID");
        bytes32 rotateFunctionId = vm.envBytes32("ROTATE_FUNCTION_ID");
        address customProver = vm.envAddress("CUSTOM_PROVER");

        vm.startBroadcast();

        gateway.setWhitelistStatus(headerRangeFunctionId, WHITELIST_CUSTOM);
        gateway.addCustomProver(headerRangeFunctionId, customProver);

        gateway.setWhitelistStatus(rotateFunctionId, WHITELIST_CUSTOM);
        gateway.addCustomProver(rotateFunctionId, customProver);

        vm.stopBroadcast();
    }
}
